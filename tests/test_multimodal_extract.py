"""Multimodal plumbing + extraction-expression library."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.functions import extract as ex
from facebook_crawler_spark.operators import multimodal as mm
from facebook_crawler_spark.sources import synthetic as syn


@pytest.fixture(scope="module")
def images(spark):
    return syn.gen_images(spark, 100, partitions=4).cache()


def test_decode_features(images, spark):
    feats = mm.decode_features(images)
    rows = feats.collect()
    assert len(rows) == 100 and all(r.ok for r in rows)
    # recomputed phash: exact for EVERY format — the stored phash is
    # stamped from the decoded-after-encode pixels (synthetic.image_row)
    # and the codec is deterministic
    joined = feats.alias("f").join(images.alias("i"), "image_id").select(
        F.col("i.fmt").alias("fmt"),
        F.bit_count(F.col("f.phash").bitwiseXOR(F.col("i.phash"))).alias("ham"),
        F.col("f.w").alias("w1"), F.col("i.w").alias("w2"),
    )
    assert joined.filter("w1 != w2").count() == 0
    assert joined.filter("ham != 0").count() == 0
    # corrupt payload → ok=false, not a task failure
    bad = spark.createDataFrame([("bad", bytearray(b"\x00\x01"))], ["image_id", "bytes"])
    out = mm.decode_features(bad).collect()
    assert len(out) == 1 and not out[0].ok and out[0].fmt == "corrupt"


def test_resize_images(images):
    out = mm.resize_images(images.limit(10), 16, 16).collect()
    from facebook_crawler_spark.functions import images as img

    for r in out:
        fmt, arr = img.decode(bytes(r.bytes))
        assert arr.shape == (16, 16, 3) and fmt == "png"


def test_video_frame_sampling(spark):
    df = spark.createDataFrame([("v1", bytearray(bytes(range(256)) * 20))], ["video_id", "bytes"])
    out = mm.sample_video_frames(df, every_n=10).collect()
    assert len(out) == 8  # 5120 bytes / (64*10)
    assert [r.frame_idx for r in out] == list(range(8))


def test_audio_features(spark):
    df = spark.createDataFrame(
        [("a1", bytearray(b"\x01\x02\x03\x04")), ("a2", bytearray(b""))], ["audio_id", "bytes"]
    )
    out = {r.audio_id: r.features for r in mm.extract_audio_features(df).collect()}
    assert out["a1"][0] == 2.5 and out["a2"] == [0.0, 0.0, 0.0, 0.0]


HTML = (
    '{"marketplace_listing_title":"Vintage Bike","actors":[{"id":"42","__typename":"User"}],'
    '"listing_photos":[{"image":{"uri":"https://cdn/1.jpg"}},{"image":{"uri":"https://cdn/2.jpg"}}],'
    '"is_boosted":"null","vehicle_make_display_name":"VW","vehicle_odometer_data":{"value":120000,"unit":"km"},'
    '"vehicle_power":{"value":"110 hp"},'
    '"pdp_display_sections":[{"pdp_fields":[{"icon_name":"bed","display_label":"3 rooms"},'
    '{"icon_name":"bath","display_label":"2 baths"}]}]}'
)


def test_extract_cascade(spark):
    df = spark.createDataFrame([(HTML,)], ["html"])
    row = df.select(
        ex.title_of(F.col("html")).alias("title"),
        ex.seller_of(F.col("html")).alias("seller"),
        ex.image_links_of(F.col("html")).alias("links"),
        ex.is_boosted_of(F.col("html")).alias("boosted"),
        ex.pdp_fields_of(F.col("html")).alias("pdp"),
        *ex.automotive_fields(F.col("html")),
    ).first()
    assert row.title == "Vintage Bike"
    assert row.seller.sellerId == "42" and row.seller.sellerType == "User"
    assert row.links == ["https://cdn/1.jpg", "https://cdn/2.jpg"]
    assert row.boosted is None  # literal "null" → NULL (reference base_parser.py:66-69)
    assert row.pdp == {"bed": "3 rooms", "bath": "2 baths"}
    assert row.make == "vw" and row.mileage == "120000" and row.hp == "110 hp"


def test_extract_missing_fields_null(spark):
    df = spark.createDataFrame([("<html>no markers</html>",)], ["html"])
    row = df.select(
        ex.title_of(F.col("html")).alias("title"),
        ex.image_links_of(F.col("html")).alias("links"),
    ).first()
    assert row.title is None and row.links is None


def test_url_state_and_sold(spark):
    df = spark.createDataFrame(
        [("https://fb.com/login?next=x", "t"), ("https://fb.com/item/1", "Sold - Bike"),
         ("https://fb.com/item/2", "Nice Bike")],
        ["final_url", "title"],
    )
    rows = df.select(
        ex.url_state(F.col("final_url")).alias("state"),
        ex.is_sold(F.col("title")).alias("sold"),
    ).collect()
    assert [r.state for r in rows] == ["blocked", "alive", "alive"]
    assert [r.sold for r in rows] == [False, True, False]


def test_relative_date_and_bands(spark):
    df = spark.createDataFrame([("3 weeks ago", "?maxPrice=500&minPrice=100")], ["rel", "comb"])
    mn, mx = ex.price_band(F.col("comb"))
    row = df.select(
        ex.relative_date(F.col("rel"), F.lit("2024-01-22 00:00:00")).alias("d"),
        mn.alias("min_p"),
        mx.alias("max_p"),
    ).first()
    assert str(row.d) == "2024-01-01 00:00:00"
    assert (row.min_p, row.max_p) == (100, 500)
