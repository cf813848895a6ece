"""Schedule-pruned images scan (sources/layout.py + CrawlEngine
images_n_buckets): the round's schedule pushes into the images scan as
partition + row-group filters, and the pruned engine's tables are
bit-identical to the unpruned engine's."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from facebook_crawler_spark.sources import synthetic as syn
from facebook_crawler_spark.sources.layout import (
    BUCKET_COL,
    read_bucketed_images,
    write_bucketed_images,
)
from facebook_crawler_spark.streaming.round_runner import CrawlEngine, DiscoveryConfig

N_IMAGES = 250
N_SEED_IMAGES = 300  # > N_IMAGES: ~1/6 of the schedule misses (pruned-miss path)
N_URLS = 900
N_HOSTS = 6
N_BUCKETS = 64


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    images = syn.gen_images(spark, N_IMAGES, partitions=4, dim_span=9).cache()
    path = str(tmp_path_factory.mktemp("imglayout") / "images")
    write_bucketed_images(images, path, N_BUCKETS)
    disk = read_bucketed_images(spark, path)
    hosts = syn.gen_hosts(spark, N_HOSTS, token_rate=40, ban_threshold=15)
    seeds = syn.gen_frontier_seeds(spark, N_URLS, n_images=N_SEED_IMAGES, n_hosts=N_HOSTS)
    return images, disk, hosts, seeds


def _fetched_rows(spark, eng):
    return {
        (r.url_hash, r.fetch_round, r.fetch_seq, r.status, r.image_id,
         r.caption, r.verified)
        for r in eng.fetched.read(spark).collect()
    }


def test_pruned_engine_matches_plain(spark, world, tmp_path_factory):
    """Pruned vs unpruned engines over the same inputs produce identical
    fetched tables — including miss rows for scheduled ids absent from the
    images table entirely."""
    images, disk, hosts, seeds = world
    results = []
    for label, img_df, nb in (("plain", images, 0), ("pruned", disk, N_BUCKETS)):
        wd = str(tmp_path_factory.mktemp(f"prune_{label}"))
        eng = CrawlEngine(
            spark, wd, img_df, hosts, error_permille=50, images_n_buckets=nb,
            discovery=DiscoveryConfig(n_images=N_IMAGES, n_hosts=N_HOSTS),
        )
        eng.seed(seeds)
        eng.run(max_rounds=25)
        results.append(_fetched_rows(spark, eng))
    assert results[0] == results[1] and results[0]
    # the miss path was actually exercised
    assert any(r[3] == "missing" for r in results[0])


def test_pruned_scan_plan_has_filters(spark, world):
    """The pruned fetch scan carries PartitionFilters (bucket IN-set →
    directory/file skipping) and PushedFilters (image_id range → row-group
    min/max skipping) — the two plan properties that make per-round I/O
    O(touched buckets) instead of O(|images|)."""
    _, disk, hosts, _ = world
    eng = CrawlEngine(spark, "/tmp/unused-prune-wd", disk, hosts, images_n_buckets=N_BUCKETS)
    schedule = spark.range(12).select(
        F.format_string("img_%012d", F.col("id") * 17).alias("image_id"),
        (F.col("id") * 7).alias("url_hash"),
    )
    pruned = eng._prune_images_for(schedule)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # the IN-set renders as "INSET" above ~10 values and "IN (...)" below
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and any(
        BUCKET_COL in ln and ("INSET" in ln or " IN " in ln) for ln in part_lines
    )
    assert "GreaterThanOrEqual(image_id" in plan and "LessThanOrEqual(image_id" in plan
    # the filters are sound: pruned scan still contains every scheduled id
    # that exists in the table at all
    present = pruned.join(F.broadcast(schedule), "image_id").count()
    expected = disk.join(F.broadcast(schedule), "image_id").count()
    assert present == expected > 0


def test_pruned_engine_kill_resume(spark, world, tmp_path_factory):
    """Mid-crawl process death with pruning on: a fresh engine resumes to
    the same tables as an uninterrupted pruned run."""
    _, disk, hosts, seeds = world
    wd_full = str(tmp_path_factory.mktemp("prune_full"))
    eng_full = CrawlEngine(
        spark, wd_full, disk, hosts, error_permille=50, images_n_buckets=N_BUCKETS
    )
    eng_full.seed(seeds)
    eng_full.run(max_rounds=25)

    wd = str(tmp_path_factory.mktemp("prune_resume"))
    eng = CrawlEngine(spark, wd, disk, hosts, error_permille=50, images_n_buckets=N_BUCKETS)
    eng.seed(seeds)
    for _ in range(3):  # "crash" after three rounds: drop the engine object
        eng.run_round()
    eng2 = CrawlEngine(spark, wd, disk, hosts, error_permille=50, images_n_buckets=N_BUCKETS)
    eng2.run(max_rounds=25)
    assert _fetched_rows(spark, eng2) == _fetched_rows(spark, eng_full)
