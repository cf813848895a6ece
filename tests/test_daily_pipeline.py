"""Composed daily-pipeline oracle test (reference main.py:11-43): an
independent pure-Python replay of the day's set algebra + closed-form page
parse must match the Spark composition stage by stage."""

from __future__ import annotations

import datetime as dt

import pytest

from facebook_crawler_spark.pipelines import daily
from facebook_crawler_spark.sources import html_fixture as hf

EPOCH = dt.datetime(2023, 11, 1)
ROUND_TS = "2023-11-15 12:00:00"
CAP = 5


def _row(k: int, file_seq: int = 0, canton: str | None = None) -> dict:
    return {
        "adId": f"ad_{k:04d}",
        "cantonCode": canton if canton is not None else ("X1" if k % 10 == 7 else "ZH"),
        # k*940 mod 997 is injective for k < 997 (997 prime) → no ties at
        # the to_check cap boundary
        "last_check": EPOCH + dt.timedelta(minutes=(k * 7919) % 997),
        "title": f"scroll title {k}",
        "file_seq": file_seq,
    }


SNAP_KS = list(range(0, 40))
SCROLL_KS = list(range(20, 50))


def _expected_parse(k: int) -> dict | None:
    if k % 13 == 0:  # Rented pages dropped by the property parser
        return None
    boosted = {0: "true", 1: "false", 2: None, 3: "true", 4: None}[k % 5]
    seller = (None, None) if k % 11 == 0 else (f"seller_{k % 500}", "User" if k % 2 == 0 else "Page")
    return {
        "title": f"Listing {k}" + (" - Sold" if k % 7 == 0 else ""),
        "description": f"Desc {k}",
        "isBoosted": boosted,
        "sellerId": seller[0],
        "sellerType": seller[1],
        "imageLinks": [f"https://scontent.example/{k}_{j}.jpg" for j in range(1, k % 4 + 1)],
        "rooms": f"{k % 5 + 1} Beds",
        "bathrooms": f"{k % 3 + 1} Baths",
        "propertyType": hf.PTYPES[k % 2].lower(),
        "parking": hf.PARKING[k % 3].lower(),
    }


def _python_oracle():
    scroll_rows = [_row(k) for k in SCROLL_KS] + [_row(25, file_seq=5), _row(31, file_seq=3)]
    snap_rows = [_row(k) for k in SNAP_KS]
    cantons = set(hf.CANTONS)

    dedup: dict[str, dict] = {}
    for r in sorted(scroll_rows, key=lambda r: r["file_seq"]):  # last file_seq wins
        dedup[r["adId"]] = r
    scroll = {k: v for k, v in dedup.items() if v["cantonCode"] in cantons}
    snap = {r["adId"]: r for r in snap_rows}

    delta = {k: v for k, v in scroll.items() if k not in snap}
    overlap = [v for k, v in snap.items() if k in scroll]
    missing = sorted(
        (v for k, v in snap.items() if k not in scroll),
        key=lambda r: (r["last_check"], r["adId"]),
    )
    to_check, not_to_check = missing[:CAP], missing[CAP:]

    def num(ad: str) -> int:
        return int(ad.split("_")[1])

    parsed = {k: _expected_parse(num(k)) for k in delta}
    parsed = {k: v for k, v in parsed.items() if v is not None}
    available = [r for r in to_check if num(r["adId"]) % 4 == 3 and num(r["adId"]) % 7 != 0]
    return snap_rows, scroll_rows, delta, overlap, to_check, not_to_check, parsed, available


@pytest.fixture(scope="module")
def result(spark):
    snap_rows, scroll_rows, *_ = _python_oracle()
    schema = "adId string, cantonCode string, last_check timestamp, title string, file_seq int"
    snapshot = spark.createDataFrame(snap_rows, schema)
    scroll = spark.createDataFrame(scroll_rows, schema)
    cantons = spark.createDataFrame([(c,) for c in hf.CANTONS], ["cantonCode"])
    return daily.daily_snapshot(
        snapshot,
        scroll,
        cantons,
        fetch_detail=hf.pages_for_listings,
        fetch_recheck=hf.pages_for_listings,
        category="propertyrentals",
        check_cap=CAP,
        round_ts=ROUND_TS,
    )


def test_assemble_automotive_fields(spark):
    """AUTOMOTIVE_RECORD assembly (reference parsers/automotive_parser.py:14-63
    + schemas/automotive_schemas.py:4-17): closed-form field checks."""
    from facebook_crawler_spark import schemas

    df = spark.createDataFrame([(f"ad_{k:04d}",) for k in range(30)], ["adId"])
    out = daily.assemble_automotive(hf.pages_for_listings(df))
    missing = {f.name for f in schemas.AUTOMOTIVE_RECORD.fields} - set(out.columns) - {
        f.name for f in schemas.LISTING.fields
    }
    assert missing == set(), missing
    for r in out.collect():
        k = int(r.adId.split("_")[1])
        assert r.make == f"make{k % 9}"
        assert r.mileage == str((k * 37) % 200000)
        assert r.hp == f"{k % 300 + 50} PS"
        assert (r.type, r.vehicleType) == ("automotive", "vehicle")
        assert r.originalCategoryId == "807311116002614"


def test_set_algebra_stages(result):
    _, _, delta, overlap, to_check, not_to_check, _, _ = _python_oracle()
    assert {r.adId for r in result["delta"].collect()} == set(delta)
    assert {r.adId for r in result["overlap"].collect()} == {r["adId"] for r in overlap}
    assert {r.adId for r in result["to_check"].collect()} == {r["adId"] for r in to_check}
    assert {r.adId for r in result["not_to_check"].collect()} == {r["adId"] for r in not_to_check}


def test_parsed_delta_records(result):
    *_, parsed, _ = _python_oracle()
    got = {r.adId: r for r in result["parsed_delta"].collect()}
    assert set(got) == set(parsed)
    for ad, exp in parsed.items():
        r = got[ad]
        for field, want in exp.items():
            have = r[field]
            have = list(have) if have is not None and field == "imageLinks" else have
            assert have == want, (ad, field, have, want)
        # pydantic-constant columns (reference property_schemas.py:4-14)
        assert (r["type"], r["saleType"]) == ("property", "rent")
        assert r["originalCategoryId"] == "807311116002614"


def test_availability_and_merge(result):
    *_, parsed, available = _python_oracle()
    av = result["available"].collect()
    assert {r.adId for r in av} == {r["adId"] for r in available}
    assert all(str(r.last_check) == "2023-11-15 12:00:00" for r in av)

    _, _, _, overlap, _, not_to_check, _, _ = _python_oracle()
    snap_ids = sorted(r.adId for r in result["snapshot_t0"].collect())
    want = sorted(
        list(parsed)
        + [r["adId"] for r in available]
        + [r["adId"] for r in overlap]
        + [r["adId"] for r in not_to_check]
    )
    assert snap_ids == want
