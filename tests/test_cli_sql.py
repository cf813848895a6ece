"""CLI runner (spark-submit entrypoint) + spark.sql surface."""

from __future__ import annotations

import json
import subprocess
import sys

from facebook_crawler_spark.sql import register_crawl, register_testdata


def test_sql_surface_over_testdata(spark, sf_dir):
    register_testdata(spark, sf_dir)
    row = spark.sql(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 1"
    ).first()
    assert row is not None and row.n > 0


def test_cli_run_and_resume(tmp_path):
    wd = str(tmp_path / "crawl")
    # sized for ~4 rounds: multi-round politeness + discovery + resume are
    # all exercised; the old 10-round fixture (token-rate 60) blew its
    # timeout under this sandbox's host-starvation stalls (round-5 note in
    # conftest) without testing anything extra
    cmd = [
        sys.executable, "-m", "facebook_crawler_spark.run_crawl",
        "--workdir", wd, "--urls", "600", "--images", "300", "--hosts", "8",
        "--token-rate", "200", "--dim-span", "9", "--discovery",
    ]
    import os

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH="/root/repo")
    # timeout is a hang backstop, NOT a perf assertion: the fixture runs
    # ~150 s in a clean window, but this sandbox's host-starvation bursts
    # slow same-code runs 2.5-3x (idle-box CPU probe 1.4-1.7 s vs 0.6
    # clean, round-5 weather note) — 600 s proved marginal and false-failed
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["fetched"] > 0 and stats["rounds"] >= 1
    # second invocation resumes (frontier exists) and immediately drains
    out2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "resuming from round" in out2.stderr
    stats2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert stats2["scheduled"] == 0  # everything already fetched


def test_sql_surface_over_crawl_tables(spark, tmp_path):
    from facebook_crawler_spark.sources import synthetic as syn
    from facebook_crawler_spark.streaming.round_runner import CrawlEngine

    images = syn.gen_images(spark, 200, partitions=2, dim_span=9)
    hosts = syn.gen_hosts(spark, 4, token_rate=100)
    seeds = syn.gen_frontier_seeds(spark, 300, n_images=200, n_hosts=4)
    wd = str(tmp_path / "sqlcrawl")
    eng = CrawlEngine(spark, wd, images, hosts)
    eng.seed(seeds)
    eng.run(max_rounds=10)
    register_crawl(spark, wd)
    row = spark.sql(
        "SELECT count(*) AS n FROM fetched f JOIN frontier fr USING (url_hash) WHERE f.status='ok'"
    ).first()
    assert row.n > 0
    ledger = spark.sql("SELECT sum(scheduled) AS s FROM round_ledger").first()
    assert ledger.s == spark.sql("SELECT count(*) FROM fetched").first()[0]
