"""html_extract UDF (F17) + ledgered-table shim commit semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.functions.html import html_extract, parse_scroll_grid
from facebook_crawler_spark.sources.tables import Table

PAGE = (
    '{"marketplace_listing_title":"Nice Bike","actors":[{"id":"7","__typename":"User"}],'
    '"listing_photos":[{"image":{"uri":"https://cdn/a.jpg"}}],"is_boosted":false}'
)
SOLD_PAGE = '<html><title>Sold - Gone</title></html>'
GRID = (
    '<div><a href="/marketplace/item/111/?ref=x" class="x"><span class="price">CHF 20</span>'
    '<span class="loc">Zürich, ZH</span></a>'
    '<a href="/marketplace/item/222/" class="x"><span class="price">CHF 30</span>'
    '<span class="loc">Genève, GE</span></a></div>'
)


def test_html_extract(spark):
    df = spark.createDataFrame([(1, PAGE), (2, SOLD_PAGE), (3, "<p>nothing</p>")], ["page_id", "html"])
    rows = {r.page_id: r for r in html_extract(df).collect()}
    assert rows[1].title == "Nice Bike"
    assert rows[1].sellerId == "7" and rows[1].sellerType == "User"
    assert rows[1].imageLinks == ["https://cdn/a.jpg"]
    assert rows[1].isBoosted == "false" and not rows[1].is_sold
    assert rows[2].title == "Sold - Gone" and rows[2].is_sold
    assert rows[3].title is None and rows[3].imageLinks is None


def test_parse_scroll_grid(spark):
    df = spark.createDataFrame([(10, GRID)], ["page_id", "html"])
    rows = sorted(parse_scroll_grid(df).collect(), key=lambda r: r.adId)
    assert len(rows) == 2
    assert rows[0].adId == "111"
    assert rows[0].url == "https://www.facebook.com/marketplace/item/111"
    assert (rows[0].city, rows[0].cantonCode) == ("Zürich", "ZH")
    assert rows[1].price == "CHF 30"


def test_table_commit_semantics(spark, tmp_path):
    t = Table(str(tmp_path / "t"))
    assert not t.exists()
    df1 = spark.range(5).withColumnRenamed("id", "k")
    v1 = t.append(df1)
    assert v1 == 1 and t.read(spark).count() == 5
    v2 = t.append(spark.range(3).withColumnRenamed("id", "k"))
    assert v2 == 2 and t.read(spark).count() == 8
    # time travel
    assert t.read(spark, version=1).count() == 5
    v3 = t.overwrite(spark.range(2).withColumnRenamed("id", "k"))
    assert v3 == 3 and t.read(spark).count() == 2
    assert t.read(spark, version=2).count() == 8


def test_table_expire_versions(spark, tmp_path):
    t = Table(str(tmp_path / "gc"))
    t.append(spark.range(3).withColumnRenamed("id", "k"))
    t.append(spark.range(4).withColumnRenamed("id", "k"))
    t.overwrite(spark.range(2).withColumnRenamed("id", "k"))
    removed = t.expire_versions(keep_last=1)
    assert removed >= 1
    assert t.read(spark).count() == 2  # current snapshot intact
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read(spark, version=1)  # expired


def test_table_read_missing_raises(spark, tmp_path):
    t = Table(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        t.read(spark)
