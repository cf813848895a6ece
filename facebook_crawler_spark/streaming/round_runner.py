"""The micro-batch crawl engine: seed → rounds of (schedule → fetch →
commit) with ACID checkpoints and per-partition lineage (SURVEY.md §3, M4-M7).

Each round is the declarative analog of the reference's sequential loops:

reference (crawlers/details_crawler.py:25-110)      engine
-----------------------------------------------    ---------------------------
Redis remaining-work list                            frontier ∖ fetched (anti-join,
                                                     bloom-prefiltered)
chunk of 50 per proxy                                per-host budget rank (window)
page.goto + parse                                    frontier ⋈ images (the
                                                     synthetic fetch, per north_rule)
proxy ban counter / rotation                         host quarantine state table
rewrite Redis after every item                       one ACID commit per round with
                                                     per-partition lineage rows

Determinism contract (north_rule): crawl order is a pure function of the
persisted seed ranks + politeness budget — never of partition iteration
order — so the same seed list always yields the same (round, host,
host_rank) order and URL-seen set as the single-node reference simulator
(facebook_crawler_spark.sim.oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from facebook_crawler_spark.functions.urls import canonicalize_urls, frontier_url_hash
from facebook_crawler_spark.sources.tables import Table
from facebook_crawler_spark.streaming import politeness
from facebook_crawler_spark.streaming.seenset import (
    build_bloom,
    build_cuckoo,
    split_by_bloom,
    split_by_cuckoo,
)

N_LINEAGE_BUCKETS = 64


class DiscoveryConfig:
    """Synthetic outlink expansion (the scroll-discovery stage, reference
    crawlers/scroll_crawler.py:39-174 via SURVEY.md §3.3): each successful
    fetch deterministically spawns 0-2 new URLs, appended to the frontier
    with first-wins dedup. All arithmetic is pure modular so the Python
    simulator reproduces it bit-for-bit.

    child target image  t = (|h| mod P) * (j+1) + r*1007   (mod n_images)
    child host          hot iff ((t mod P)*2654435761) mod 100 < hot_pct
    child url           https://{host}/item/img_{t}?disc={j}
    child priority      inherited
    child seed_rank     ((parent_rank mod 2^40)*31 + j*7 + r) mod 2^40
    """

    def __init__(self, n_images: int, n_hosts: int = 200, hot_pct: int = 40,
                 hot_host: str = "cdn.fb-images.test", max_out: int = 3):
        self.n_images = n_images
        self.n_hosts = n_hosts
        self.hot_pct = hot_pct
        self.hot_host = hot_host
        self.max_out = max_out


def _verify_udf():
    """Arrow-batched payload verifier (BASELINE.json input_hint): decode the
    fetched bytes, recompute the oracle pixels from the image id, check
    PSNR ≥ 40 dB (lossy) / exactness (lossless), phash match, and
    byte-exact caption. Runs inside the fetch round so every committed row
    carries its verification verdict."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    from facebook_crawler_spark.functions import images as img  # noqa: PLC0415
    from facebook_crawler_spark.sources.synthetic import caption_for  # noqa: PLC0415

    # no type annotations: `from __future__ import annotations` turns them
    # into strings pyspark can't resolve against local imports
    def verify_row(i, iid, buf, cap, ph, out):
        """Scalar verification of one row (the fallback path, and the
        reference semantics the batch path must reproduce exactly)."""
        try:
            idx = int(iid.split("_")[1])
            fmt, arr = img.decode(bytes(buf))
            ref = img.pixels_for(idx, arr.shape[1], arr.shape[0])
            pixels_ok = (
                np.array_equal(arr, ref) if fmt == "png" else img.psnr(ref, arr) >= 40.0
            )
            # phash: EXACT for every format — the stored phash is stamped
            # from the decoded-after-encode pixels (synthetic.image_row)
            # and the codec is deterministic, so a byte-correct fetch
            # matches bit-for-bit; the old calibrated lossy bound (ham ≤ 2)
            # was falsified by the property suite at 32x33 jpeg (hamming 3)
            phash_ok = img.phash64(arr) == int(ph)
            out[i] = bool(pixels_ok and cap == caption_for(idx) and phash_ok)
        except Exception:
            out[i] = False

    def verify(image_id, data, caption, phash_str):
        # phash arrives as a STRING: a nullable int64 batch converts to
        # float64 in pandas, silently corrupting 63-bit hash values.
        #
        # Vectorized verification (guide §4.2: hand whole batches to
        # native code): rows are grouped by (fmt, w, h) parsed from the
        # codec header, each uniform group is stacked into one (n, h, w, 3)
        # array, and decode-compare + PSNR + phash run as single numpy
        # expressions over the stack — identical arithmetic to the scalar
        # path (int64 sums, same float divisions). Oracle pixels stay
        # per-row (each image seeds its own PCG64 stream). Any malformed
        # row (bad header, truncated payload, unparsable id) falls back to
        # the scalar path, which also owns the per-row exception semantics.
        import struct as _struct  # noqa: PLC0415

        n = len(image_id)
        out = np.zeros(n, dtype=object)
        ids = list(image_id)
        bufs = list(data)
        caps = list(caption)
        phs = list(phash_str)
        groups = {}
        for i in range(n):
            buf, ph = bufs[i], phs[i]
            if buf is None or ph is None:
                out[i] = None
                continue
            b = bytes(buf)
            try:
                magic, w, h = _struct.unpack_from(">4sHH", b)
                idx = int(ids[i].split("_")[1])
                fmt = {b"FPNG": "png", b"FJPG": "jpeg"}[magic]
                if len(b) != 8 + w * h * 3 or h < 8 or w < 8:
                    raise ValueError
            except Exception:
                verify_row(i, ids[i], b, caps[i], phs[i], out)
                continue
            groups.setdefault((fmt, w, h), []).append((i, idx, b))
        for (fmt, w, h), rows in groups.items():
            try:
                stack = np.stack(
                    [np.frombuffer(b, dtype=np.uint8, offset=8).reshape(h, w, 3) for _, _, b in rows]
                )
                refs = np.stack([img.pixels_for(idx, w, h) for _, idx, _ in rows])
                if fmt == "png":
                    pixels_ok = (stack == refs).reshape(len(rows), -1).all(axis=1)
                else:
                    diff = stack.astype(np.int32) - refs.astype(np.int32)
                    mse = (diff * diff).mean(axis=(1, 2, 3))
                    with np.errstate(divide="ignore"):
                        psnr = 10.0 * np.log10(255.0**2 / mse)  # mse==0 → inf
                    pixels_ok = psnr >= 40.0
                phash_ok = img.phash64_batch(stack) == np.array(
                    [int(phs[i]) for i, _, _ in rows], dtype=np.int64
                )
                for j, (i, idx, _) in enumerate(rows):
                    out[i] = bool(
                        pixels_ok[j] and phash_ok[j] and caps[i] == caption_for(idx)
                    )
            except Exception:
                for i, _, b in rows:
                    verify_row(i, ids[i], b, caps[i], phs[i], out)
        return pd.Series(out)

    return pandas_udf(verify, "boolean")


def _error_expr(round_no: int, permille: int):
    """Deterministic fetch-failure injection: pure modular arithmetic on
    (url_hash, round) so the Python simulator reproduces it exactly (no
    engine-specific hash)."""
    base = F.pmod(F.col("url_hash"), F.lit(1_000_000_007))
    return F.pmod(base + round_no * 2_654_435_761, F.lit(1000)) < permille


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        images: DataFrame,
        hosts: DataFrame,
        error_permille: int = 0,
        use_bloom: bool = True,
        bloom_bits: int = 1 << 20,
        bloom_min_seen: int = 100_000,
        bloom_driver_budget: int = 1 << 30,
        seen_filter: str = "bloom",  # "bloom" | "cuckoo" (see seenset.py trade-off)
        cache_frontier: bool = True,
        verify_payloads: bool = True,
        store_payloads: bool = True,
        discovery: DiscoveryConfig | None = None,
        hash_mode: str = "xxhash64",  # "xxhash64" (JVM, production) | "fnv" (sim-parity)
        fetch_join: str = "auto",  # "auto" | "broadcast" | "shuffle"
        broadcast_schedule_max: int = 250_000,
        inline_verify_max: int = 100_000,  # pending bound below which the verify verdict rides the append plan (0 = always slim)
        inline_verify_bytes: int = 4 << 30,  # payload-bytes bound (pending x est. bytes/row) for the same election when Catalyst stats expose bytes/row
        images_bucketed: bool = False,  # caller asserts images is hash-laid-out by image_id
        images_n_buckets: int = 0,  # >0: images carries layout.BUCKET_COL = bucket(n, image_id)
        frontier_n_buckets: int = 0,  # >0: frontier table partitioned by p_fbucket = pmod(url_hash, n)
        prebuild_bloom: bool = True,  # run(): stage the discovery bloom's cold-start build in the pool
        frontier_compact_dirs: int = 64,  # compact the frontier when its snapshot spans >= this many data dirs (0 = off)
    ):
        self.spark = spark
        self.workdir = workdir
        self.images = images
        self.hosts = hosts.cache()
        self.error_permille = error_permille
        self.use_bloom = use_bloom
        self.bloom_bits = bloom_bits
        # below this seen-set size the exact anti-join is cheaper than a
        # bloom build+broadcast round trip; above it the bloom keeps the
        # anti-join input to the maybe-seen sliver (M5 scale path)
        self.bloom_min_seen = bloom_min_seen
        # Hard cap on the maintained frontier bloom's DRIVER bytes (the
        # filter lives on the driver between rounds and is broadcast per
        # discovery round). The natural sizing is 10 bits/frontier-key —
        # 1.25 GB at 10^9 keys, 12.5 GB at the 10^10 design point — so
        # an uncapped bloom plus its OR temp plus the broadcast copy would
        # blow any sane --driver-memory (run_crawl.py's guidance is 16g).
        # Capping is SAFE by the route-never-decide contract: fewer bits →
        # more false positives → more rows routed to the exact dup check,
        # never a wrong answer. Past ~budget×0.8 keys (< ~1 bit/key even
        # with k adapted to 1) the bloom degrades toward pass-through and
        # the exact check carries the load; the at-scale mitigation is
        # sharding the filter by url_hash range across several budget-sized
        # arrays (or running discovery dedup purely exact) — stated here so
        # the bound is explicit rather than discovered at 10^10.
        self.bloom_driver_budget = bloom_driver_budget
        self.seen_filter = seen_filter
        self.cache_frontier = cache_frontier
        self.verify_payloads = verify_payloads
        # verification-crawl variant: fetch + verify, keep captions/phash/
        # verdicts, drop the image bytes from the committed table (the shape
        # of a dedup- or QA-only crawl where payloads live elsewhere)
        self.store_payloads = store_payloads
        self.discovery = discovery
        # url_hash family for seed + discovery (functions/urls.py). The JVM
        # xxhash64 default keeps the frontier's hottest projection out of
        # Python entirely; the simulator replays it with its own pure-Python
        # XXH64. "fnv" remains for external oracles wanting a 6-line hash.
        self.hash_mode = hash_mode
        # Fetch-join strategy (see run_round): "broadcast" ships the round's
        # slim schedule into the images scan (right when the politeness
        # budget bounds |selected| — the steady-state crawl); "shuffle" is a
        # shuffle-hash join where ONLY the slim schedule crosses the
        # exchange (the bulk-drain scale path: a driver-built broadcast
        # relation of a multi-million-row schedule is serial). "auto" picks
        # per round from the free driver-side pending bound
        # (|frontier| − |seen|) — but only elects shuffle when the caller
        # asserted `images_bucketed`: without an image_id hash layout the
        # shuffle-hash join would exchange the IMAGES side and the payload
        # bytes would cross the wire, the one plan property this engine
        # never allows. On a cluster the layout is Iceberg
        # bucket(N, image_id) with N sized to the DATA (bounded bytes per
        # bucket), not to the executor count — PLANS.md round 3 measured
        # what executor-count-sized buckets do to the verify stage's task
        # granularity.
        self.fetch_join = fetch_join
        self.broadcast_schedule_max = broadcast_schedule_max
        # Verify-path election (see run_round): below this driver-known
        # pending bound the verify verdict is computed inline in the append
        # plan (one job per round); above it the slim-projection +
        # failures-broadcast form keeps payload bytes out of the
        # ArrowEvalPython buffer queue. 0 forces the slim path everywhere.
        # `inline_verify_bytes` refines the row bound when the images plan
        # carries Catalyst row-count stats (a cached/counted table does):
        # inline is also allowed when pending x estimated-bytes-per-row
        # stays under this budget — the quantity the queue concern is
        # actually about. Unknown stats → row bound only (conservative).
        self.inline_verify_max = inline_verify_max
        self.inline_verify_bytes = inline_verify_bytes
        self._img_row_bytes: float | None | str = "unset"
        self.images_bucketed = images_bucketed
        # Schedule-pruned images scan (sources/layout.py): when the caller
        # read `images` from a bucket(n, image_id) layout, every round's
        # fetch join restricts the scan to the partitions + row groups the
        # round's schedule can possibly hit — per-round bytes read become
        # O(touched buckets), not O(|images|). This is the disk-layout
        # complement of `images_bucketed` (which asserts an in-memory HASH
        # layout for the shuffle-hash join): a partitionBy directory layout
        # is NOT hash-partitioned in Catalyst's eyes, so don't assert
        # images_bucketed for it — the pruned scan pairs with the broadcast
        # fetch join, which is the steady-state politeness-bounded regime
        # anyway.
        self.images_n_buckets = images_n_buckets
        # Bucketed frontier layout (the frontier-side twin of
        # images_n_buckets; VERDICT r4 "what's wrong" #3): the frontier
        # table is written partitioned by p_fbucket = pmod(url_hash, n), so
        # the discovery dup-check — the last O(|frontier|)-per-round scan
        # in the loop — prunes to the buckets the round's maybe-sliver can
        # possibly hit instead of scanning the whole url_hash column. Same
        # soundness argument as the images pruning (every maybe hash's
        # bucket is in the IN-set) and the same s-vs-N coverage model. On
        # real Iceberg this is `bucket(n, url_hash)` with one
        # metadata-pruned scan; on the parquet shim each commit is its own
        # partition-discovered root, so reads union per-commit scans and
        # the filter pushes into each (see Table.read).
        self.frontier_n_buckets = frontier_n_buckets
        self.prebuild_bloom = prebuild_bloom
        self.frontier_compact_dirs = frontier_compact_dirs
        self.frontier = Table(os.path.join(workdir, "frontier"))
        self.fetched = Table(os.path.join(workdir, "fetched"))
        self.host_state = Table(os.path.join(workdir, "host_state"))
        self.ledger = Table(os.path.join(workdir, "round_ledger"))
        # quarantine-transition events (host, round, reason) — the alert
        # channel (reference utils/aleritna.py:28-43)
        self.alerts = Table(os.path.join(workdir, "alerts"))
        # driver-side caches — pure accelerators; all state of record lives
        # in the tables, so a fresh engine (resume) reconstructs them
        self._round: int | None = None
        self._seen_rows: int | None = None
        self._frontier_df: DataFrame | None = None
        self._fresh_process = True  # first round after (re)start re-checks idempotency
        # accumulated ok-url_hash set, unioned incrementally instead of
        # re-reading the growing fetched table every round (O(R²) rows read
        # over R rounds otherwise); lineage truncated periodically
        self._seen_df: DataFrame | None = None
        # driver-side frontier row count (seed Observation + discovery
        # deltas; a resumed engine reconstructs it with one count()). Lets
        # run() prove `remaining == 0` without paying a full probe round —
        # the terminal round's bloom build + all-seen anti-join + empty
        # commit were a pure per-run flat cost (core-count-independent),
        # exactly what the N→4N scaling ratio is most sensitive to.
        self._frontier_rows: int | None = None
        # maintained bloom over ALL frontier url_hashes (discovery-dedup
        # accelerator). Invariant: never missing a committed frontier hash
        # (false NEGATIVES would re-admit known URLs as "new"); extra hashes
        # (e.g. from a crashed append) are mere false positives and only
        # route rows to the exact check. A fresh process rebuilds it from
        # the frontier table; growth past ~10 bits/key triggers a doubling
        # rebuild (amortizes to ~2x one final scan over the crawl).
        self._frontier_bloom: bytes | None = None
        self._frontier_bloom_bits: int = 0
        self._frontier_bloom_k: int = 5
        # incrementally maintained pending set (frontier ∖ ok-fetched):
        # pending_{r+1} = (pending_r ∖ ok_r) ∪ children_r — ok_r is
        # politeness-bounded (broadcastable) and children_r is the round's
        # own discovery output, so steady-state rounds never rescan the
        # frontier or the seen set. Accelerator only: a fresh process
        # rebuilds it exactly via pending().
        self._pending_df: DataFrame | None = None
        self._pending_add: DataFrame | None = None  # children awaiting fold-in
        # deferred-ledger overlap (run() only): the round's ledger append is
        # submitted to the engine pool and awaited by the NEXT round just
        # before its first table write — so the ledger's driver-side commit
        # tail (~0.3-0.5 s: manifest write, file moves) overlaps the next
        # round's pure-driver plan construction instead of serializing with
        # it. The await point preserves the barrier invariant (at most ONE
        # round's data may exist beyond the last committed ledger round):
        # no round-r+1 write of ANY table starts until ledger r has landed,
        # so a crash still leaves exactly the states the resume walk-back
        # and idempotent-append guards already handle. Direct run_round()
        # callers keep the fully synchronous commit (defer off by default).
        self._ledger_fut = None
        self._pool = None
        # in-flight cold-start prebuild of the discovery bloom (run() stages
        # it in the pool so the full-frontier bloom scan overlaps round 1's
        # other startup jobs); drained by _expand_discoveries before use
        self._bloom_prebuild = None
        # per-engine cached verify UDF: pandas_udf construction costs py4j
        # round trips; the function is round-independent so build it once
        self._verify_fn = None
        # strong references to in-flight bloom/cuckoo broadcasts: the split
        # UDFs serialize only the broadcast ID, so without these the
        # ContextCleaner can destroy the blocks under GC pressure while a
        # lazy (or eviction-recomputed) plan still needs them. Cleared at
        # the end of each round, after every consumer plan has been
        # checkpoint-truncated.
        self._bc_refs: list = []

    # ------------------------------------------------------------------ seed
    def seed(self, seeds: DataFrame) -> int:
        """Canonicalize (Arrow UDF per north_star), hash, first-wins dedup,
        salt, and commit the frontier. First-wins mirrors the reference
        consuming its shuffled list in order: the earliest seed_rank for a
        canonical URL defines its crawl position."""
        canon = seeds.withColumn("canonical_url", canonicalize_urls(F.col("url"))).withColumn(
            "url_hash", frontier_url_hash(F.col("canonical_url"), self.hash_mode)
        )
        w = Window.partitionBy("url_hash").orderBy(F.col("seed_rank").asc())
        deduped = canon.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")
        salted = deduped.join(
            F.broadcast(self.hosts.select("host", "salt_factor")), "host", "left"
        ).withColumn(
            "host_salt",
            F.pmod(F.col("url_hash"), F.coalesce(F.col("salt_factor"), F.lit(1))).cast("int"),
        ).drop("salt_factor")
        from pyspark.sql import Observation

        obs = Observation()
        rows = salted.select(
            "url", "canonical_url", "url_hash", "image_id", "host", "host_salt",
            "priority", "seed_rank", F.lit(0).alias("discovered_round"),
        )
        pb = None
        if self.frontier_n_buckets:
            rows = rows.withColumn(
                "p_fbucket",
                F.pmod(F.col("url_hash"), F.lit(self.frontier_n_buckets)).cast("int"),
            )
            pb = ["p_fbucket"]
        rows = rows.observe(obs, F.count(F.lit(1)).alias("n"))
        version = self.frontier.overwrite(rows, partition_by=pb)
        self._frontier_rows = int(obs.get["n"] or 0)
        # drain any in-flight cold-start bloom prebuild BEFORE the reset —
        # a build completing after it would install a bloom of the replaced
        # frontier (false negatives = re-admitted dups)
        fut, self._bloom_prebuild = self._bloom_prebuild, None
        if fut is not None:
            try:
                fut.result()
            except Exception:
                pass
        self._frontier_bloom = None  # seed replaces the frontier wholesale
        self.host_state.overwrite(
            self.hosts.select(
                "host", "token_rate", "ban_threshold",
                F.lit(0).cast("int").alias("consecutive_errors"),
                F.lit(False).alias("quarantined"),
            )
        )
        return version

    # --------------------------------------------------------------- resume
    def committed_round(self) -> int:
        if self._round is not None:
            return self._round
        if not self.ledger.exists():
            self._round = 0
            self._seen_rows = 0
            return 0
        df = self.ledger.read(self.spark)
        row = df.agg(F.max("round").alias("m"), F.sum("fetched").alias("f")).first()
        self._round = int(row.m) if row.m is not None else 0
        self._seen_rows = int(row.f) if row.f is not None else 0
        return self._round

    # ---------------------------------------------------------------- round
    def _frontier(self) -> DataFrame:
        """The (static-after-seed) frontier; persisted across rounds when
        it fits — at 10^10 rows MEMORY_AND_DISK spills gracefully, and a
        cluster deployment would lean on the parquet scan instead."""
        if self._frontier_df is None:
            df = self.frontier.read(self.spark)
            if self.cache_frontier:
                from pyspark.storagelevel import StorageLevel

                df = df.persist(StorageLevel.MEMORY_AND_DISK)
            self._frontier_df = df
        return self._frontier_df

    def _seen(self) -> DataFrame | None:
        """The ok-url_hash set. State of record is the fetched table; the
        in-memory handle is an accelerator that a resumed engine rebuilds
        from the table — restricted to LEDGER-BARRIERED rounds: a crash
        between the data append and the ledger commit leaves the interrupted
        round's rows in the table, and a re-run that counted them as seen
        would schedule the NEXT round's URLs under the crashed round's
        number, diverging from the uninterrupted run."""
        if self._seen_df is None and self.fetched.exists():
            self._seen_df = (
                self.fetched.read(self.spark)
                .filter(
                    (F.col("status") == "ok")
                    & (F.col("fetch_round") <= F.lit(self.committed_round()))
                )
                .select("url_hash")
            )
        return self._seen_df

    def pending(self) -> DataFrame:
        """frontier ∖ successfully-fetched, exact, bloom-accelerated once
        the seen set is large enough for the bloom to pay for itself.

        This is the FULL recomputation — used once per process (initial
        build / resume); steady-state rounds use the incrementally
        maintained set (`_pending`), whose per-round cost is bounded by
        |pending| + the round's fetch count instead of |frontier| + |seen|."""
        frontier = self._frontier()
        seen = self._seen()
        if seen is None:
            return frontier
        if self.use_bloom and (self._seen_rows or 0) >= self.bloom_min_seen:
            if self.seen_filter == "cuckoo":
                # size to ≤75% load: next power of two ≥ seen/3 (4 slots)
                n_buckets = 1 << max(10, ((self._seen_rows or 1) // 3).bit_length())
                table = build_cuckoo(seen, n_buckets=n_buckets)
                unseen, maybe = split_by_cuckoo(
                    frontier, table, n_buckets=n_buckets, ref_holder=self._bc_refs
                )
            else:
                bloom = build_bloom(seen, m_bits=self.bloom_bits)
                unseen, maybe = split_by_bloom(
                    frontier, bloom, m_bits=self.bloom_bits, ref_holder=self._bc_refs
                )
            return unseen.unionByName(maybe.join(seen, "url_hash", "left_anti"))
        return frontier.join(seen, "url_hash", "left_anti")

    def _pending(self) -> DataFrame:
        """The maintained pending set (see __init__). First call per
        process pays the exact rebuild; a fresh frontier (seen empty) just
        aliases the persisted frontier cache — its plan is a flat table
        scan, so no checkpoint is needed until rounds start folding in."""
        if self._pending_df is None:
            base = self.pending()
            if (self._seen_rows or 0) > 0:
                base = base.localCheckpoint(eager=True)
            self._pending_df = base
        return self._pending_df

    def _fold_pending(self, ok_hashes: DataFrame) -> None:
        """pending ← (pending ∖ this round's ok) ∪ this round's children.
        Broadcast anti (ok is politeness-bounded); the coalesce caps
        partition-count growth from the per-round unions. localCheckpoint
        EVERY round both materializes while the round's caches are hot and
        truncates the logical plan — mere persist() would let each round's
        plan embed the previous round's entire tree (exponential growth,
        observed driver OOM stringifying the plan by round ~20). On a
        cluster, swap for reliable checkpoint(dir) — localCheckpoint blocks
        die with their executor."""
        base = self._pending()
        nxt = base.join(F.broadcast(ok_hashes), "url_hash", "left_anti")
        if self._pending_add is not None:
            nxt = nxt.unionByName(self._pending_add.select(*base.columns))
        nxt = nxt.coalesce(self.spark.sparkContext.defaultParallelism)
        nxt = nxt.localCheckpoint(eager=True)
        if base is not self._frontier_df:
            base.unpersist()
        if self._pending_add is not None:
            self._pending_add.unpersist()
            self._pending_add = None
        self._pending_df = nxt

    def _discovery_bloom(self) -> tuple[bytes, int, int]:
        """The maintained whole-frontier bloom (see __init__). Rebuilt from
        the frontier table on first use in a process and whenever the
        frontier outgrows ~10 bits/key (doubling, so total rebuild work
        amortizes to about two final-size scans).

        Size is clamped to `bloom_driver_budget` bytes (see __init__ for
        the safety argument); when the clamp bites, k is re-derived as the
        FP-optimal ~0.69·m/n (floored at 1) instead of the fixed 5 — at low
        bits/key five probes only saturate the array faster. Incremental
        folds (_expand_discoveries) reuse the stored (bits, k) so every OR
        into the maintained array addresses identical positions."""
        rows = self._frontier_rows
        if rows is None:
            rows = self._frontier().count()
            self._frontier_rows = rows
        need = max(self.bloom_bits, 1 << (max(rows, 1) * 10 - 1).bit_length())
        need = min(need, self.bloom_driver_budget * 8)
        if self._frontier_bloom is None or self._frontier_bloom_bits < need:
            k = max(1, min(5, round(0.69 * need / max(rows, 1))))
            # build into locals; commit the triple together only on success
            # (a failed rebuild job must not leave bits/k disagreeing with
            # the array a retry would OR into)
            bloom = build_bloom(self._frontier().select("url_hash"), m_bits=need, k=k)
            self._frontier_bloom = bloom
            self._frontier_bloom_bits = need
            self._frontier_bloom_k = k
        return self._frontier_bloom, self._frontier_bloom_bits, self._frontier_bloom_k

    def _expand_discoveries(self, selected: DataFrame, fetched: DataFrame, round_no: int) -> int:
        """Append this round's deterministic outlinks to the frontier
        (first-wins dedup, anti-joined against everything already known).
        Committed BEFORE the ledger so a crash-resume re-run finds the
        children already present (idempotent via the anti-join) — and the
        `discovered_round < round` filter in run_round keeps a re-run's
        schedule identical to the uninterrupted one."""
        d = self.discovery
        ok_parents = selected.join(
            fetched.filter(F.col("status") == "ok").select("url_hash"), "url_hash", "left_semi"
        ).select("url_hash", "priority", "seed_rank")
        base = F.pmod(F.col("url_hash"), F.lit(1_000_000_007))
        kids = (
            ok_parents.withColumn("__n", F.pmod(base, F.lit(d.max_out)))
            .filter(F.col("__n") >= 1)
            .select(
                "url_hash", "priority", "seed_rank",
                F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("j"),
            )
        )
        kbase = F.pmod(F.col("url_hash"), F.lit(1_000_000_007))
        t = F.pmod(kbase * (F.col("j") + 1) + round_no * 1007, F.lit(d.n_images))
        # reduce t below 1e9+7 before the Knuth multiply: t*2654435761 would
        # overflow int64 (ANSI-mode throw) once n_images exceeds ~3.5e9; the
        # reduced product caps at ~2.7e18 < 2^63. Mirrored in sim.oracle.
        t_red = F.pmod(t, F.lit(1_000_000_007))
        host = F.when(
            F.pmod(t_red * 2_654_435_761, F.lit(100)) < d.hot_pct, F.lit(d.hot_host)
        ).otherwise(F.format_string("host-%03d.example.test", F.pmod(t * 97, F.lit(d.n_hosts - 1))))
        child_rank = F.pmod(
            F.pmod(F.col("seed_rank"), F.lit(1 << 40)) * 31 + F.col("j") * 7 + round_no,
            F.lit(1 << 40),
        )
        children = kids.select(
            F.format_string("https://%s/item/img_%012d?disc=%d", host, t, F.col("j")).alias("url"),
            F.format_string("img_%012d", t).alias("image_id"),
            host.alias("host"),
            F.col("priority"),
            child_rank.alias("seed_rank"),
        )
        canon = children.withColumn("canonical_url", canonicalize_urls(F.col("url"))).withColumn(
            "url_hash", frontier_url_hash(F.col("canonical_url"), self.hash_mode)
        )
        w = Window.partitionBy("url_hash").orderBy(F.col("seed_rank").asc(), F.col("canonical_url").asc())
        # persisted: referenced by the bloom split, the exact backstop, and
        # the bloom update below — all bounded by this round's fan-out
        deduped = (
            canon.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")
        ).persist()
        # Frontier-dedup via the maintained whole-frontier bloom: the bloom
        # routes definitely-new children straight through; only the maybe
        # sliver (true dups + false positives) gets the exact check. The
        # exact check itself never shuffles the frontier: dup hashes are
        # found by a broadcast SEMI-join INTO the (column-pruned) frontier
        # scan, then the sliver anti-joins that bounded dup set. The old
        # form anti-joined children against the full frontier — a 10^10-row
        # url_hash shuffle every discovery round.
        fut, self._bloom_prebuild = self._bloom_prebuild, None
        if fut is not None:
            try:
                fut.result()
            except Exception:
                # the prebuild commits (bloom, bits, k) atomically only on
                # success, so a failed background build leaves clean state —
                # the inline call below simply rebuilds (and raises visibly
                # if the failure was real, not a transient)
                pass
        bloom, m_bits, bloom_k = self._discovery_bloom()
        unseen, maybe = split_by_bloom(
            deduped, bloom, m_bits=m_bits, k=bloom_k, ref_holder=self._bc_refs
        )
        dup_hashes = self._dup_hashes_for(maybe)
        new = unseen.unionByName(maybe.join(F.broadcast(dup_hashes), "url_hash", "left_anti"))
        salted = (
            new.join(F.broadcast(self.hosts.select("host", "salt_factor")), "host", "left")
            .withColumn(
                "host_salt",
                F.pmod(F.col("url_hash"), F.coalesce(F.col("salt_factor"), F.lit(1))).cast("int"),
            )
            .drop("salt_factor")
        )
        rows = salted.select(
            "url", "canonical_url", "url_hash", "image_id", "host", "host_salt",
            "priority", "seed_rank", F.lit(round_no).alias("discovered_round"),
        )
        if self.frontier_n_buckets:
            rows = rows.withColumn(
                "p_fbucket",
                F.pmod(F.col("url_hash"), F.lit(self.frontier_n_buckets)).cast("int"),
            )
        # the count rides the bloom-update job via an Observation (no extra
        # count job); an all-dup round's append is a commit-level no-op
        # (Table.append skips part-less writes)
        from pyspark.sql import Observation

        obs = Observation()
        rows = rows.observe(obs, F.count(F.lit(1)).alias("n")).persist()
        # Fold the new hashes into the maintained frontier bloom BEFORE the
        # append: if the append then crashes, the bloom merely carries false
        # positives (safe); the reverse order could leave committed hashes
        # missing from the bloom (unsafe). The build also materializes the
        # cache the append below reuses.
        import numpy as np

        bloom_new = build_bloom(
            rows, m_bits=self._frontier_bloom_bits, k=self._frontier_bloom_k
        )
        self._frontier_bloom = (
            np.frombuffer(self._frontier_bloom, dtype=np.uint8)
            | np.frombuffer(bloom_new, dtype=np.uint8)
        ).tobytes()
        if self.frontier_n_buckets:
            # one file per touched bucket per append (the repartition is an
            # exchange of this round's bounded children only); without it
            # every write task emits a file into every bucket directory
            self.frontier.append(
                rows.repartition(self.frontier_n_buckets, "p_fbucket"),
                partition_by=["p_fbucket"],
            )
        else:
            self.frontier.append(rows)
        if (
            self.frontier_compact_dirs
            and self.frontier.data_dir_count() >= self.frontier_compact_dirs
        ):
            # Bound the frontier's commit-dir count (union width for the
            # bucketed layout, root count otherwise): rewrite the snapshot
            # into one commit every `frontier_compact_dirs` appends. The
            # rewrite is a full-frontier job, but triggered once per
            # threshold appends it amortizes to O(|frontier|/threshold)
            # per round — and on real Iceberg it is planning-irrelevant
            # (metadata-pruned scan) and becomes a small-files maintenance
            # job. Layout-only: the row set is unchanged, so crawl order,
            # resume, and the maintained bloom/pending are unaffected.
            self.frontier.compact(self.spark)
        n_new = int(obs.get["n"] or 0)
        deduped.unpersist()
        # children stay persisted until _fold_pending (same thread) unions
        # them into the maintained pending set and unpersists them
        self._pending_add = rows
        if self._frontier_rows is not None:
            self._frontier_rows += n_new
        if n_new and self._frontier_df is not None:
            self._frontier_df.unpersist()
            self._frontier_df = None  # re-read (and re-persist) with children
        return n_new

    def _dup_hashes_for(self, maybe: DataFrame) -> DataFrame:
        """The bounded dup set for discovery dedup: frontier hashes present
        in the maybe-sliver, found by a broadcast SEMI-join INTO the
        frontier scan (no exchange, output ≤ |maybe|).

        With `frontier_n_buckets` the scan is first pruned to the buckets
        the maybe-set can possibly occupy — pmod(url_hash, n) of the
        sliver, one bounded driver collect off the round's persisted
        children — pushed as PartitionFilters into each per-commit child
        scan (Table.read unions them). Sound because a dup's bucket is by
        definition its own hash's bucket. This removes the last
        O(|frontier|)-per-round touch in the loop; unbucketed engines keep
        the cached full-frontier scan (still column-pruned, no shuffle)."""
        key = maybe.select("url_hash")
        if self.frontier_n_buckets:
            nb = self.frontier_n_buckets
            bs = [
                r.b
                for r in maybe.select(
                    F.pmod(F.col("url_hash"), F.lit(nb)).cast("int").alias("b")
                ).distinct().collect()
            ]
            src = self.frontier.read(self.spark)
            src = src.filter(F.col("p_fbucket").isin(bs)) if bs else src.limit(0)
            return src.select("url_hash").join(F.broadcast(key), "url_hash", "left_semi")
        return (
            self._frontier()
            .select("url_hash")
            .join(F.broadcast(key), "url_hash", "left_semi")
        )

    def _prune_images_for(self, schedule: DataFrame) -> DataFrame:
        """Restrict the images scan to what this round's schedule can hit
        (images_n_buckets > 0; see __init__ and sources/layout.py).

        One driver-side aggregation of the (cached, politeness-bounded)
        schedule yields the bucket IN-set — cardinality ≤ n_buckets, never
        the schedule's — plus the id range; both push into the scan as
        PartitionFilters (file skipping) and PushedFilters (row-group
        min/max skipping). The filters are sound by construction: every
        scheduled image_id maps into the IN-set and range, so hit AND miss
        sets are bit-identical with and without pruning (tested in
        tests/test_fetch_pruning.py). The reference analog: the crawler
        fetches ONLY its scheduled URLs (crawlers/details_crawler.py:57-61)
        — it never re-reads its whole corpus per batch, and with this
        layout neither does the engine."""
        from facebook_crawler_spark.sources.layout import BUCKET_COL, bucket_expr

        row = schedule.agg(
            F.collect_set(bucket_expr(self.images_n_buckets)).alias("buckets"),
            F.min("image_id").alias("lo"),
            F.max("image_id").alias("hi"),
        ).first()
        buckets = sorted(row.buckets or [])
        if not buckets:
            return self.images  # empty schedule: join output is empty anyway
        pruned = self.images.filter(F.col(BUCKET_COL).isin(buckets))
        if len(buckets) == self.images_n_buckets:
            # schedule touches every bucket — keep the range predicate only
            # (row-group skipping can still bite; the IN-set cannot)
            pruned = self.images
        return pruned.filter(F.col("image_id").between(row.lo, row.hi))

    def _commit_pool(self):
        """Engine-lifetime two-worker pool for the commit branches and the
        deferred ledger append (thread churn per round is measurable at
        sandbox round rates)."""
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=2)
        return self._pool

    def _await_ledger(self) -> None:
        """Barrier for a deferred ledger append (see __init__): must run
        before any table write of the following round and at the end of
        run(). Re-raises the append's exception, if any."""
        if self._ledger_fut is not None:
            fut, self._ledger_fut = self._ledger_fut, None
            fut.result()

    def run_round(self, defer_ledger: bool = False) -> dict[str, int]:
        import time

        tmark: dict[str, float] = {}
        t_last = time.perf_counter()

        def mark(name: str) -> None:
            nonlocal t_last
            now = time.perf_counter()
            tmark[name] = round(now - t_last, 3)
            t_last = now

        round_no = self.committed_round() + 1
        # label this round's jobs (guide §1: setJobDescription) — the
        # description is a thread-local driver property, zero task cost;
        # the commit-pool branches label their own threads below
        sc = self.spark.sparkContext
        sc.setJobDescription(f"crawl r{round_no} plan+fetch")
        # Pin the state INPUT to the pre-round snapshot: if a crashed run
        # already overwrote host_state for this round (commit meta carries
        # the round), the re-run must recompute from the version BEFORE any
        # of this round's overwrites. Walk back over every version tagged
        # with this round — a double crash leaves two such versions, and a
        # single-step walk-back would pin to the first crashed attempt's
        # post-update state and apply the consecutive-error update twice.
        state_v = self.host_state.current_version()
        if self._fresh_process:
            while (
                state_v > 1
                and self.host_state.commit_meta(state_v).get("round") == round_no
            ):
                state_v -= 1
        state = self.host_state.read(self.spark, version=state_v)
        quarantined = state.filter(F.col("quarantined")).select("host")
        budgets = state.filter(~F.col("quarantined")).select(
            "host", F.col("token_rate").alias("budget")
        )

        # discovered_round < round: children appended by round r must not be
        # schedulable in a crash-re-run of round r itself (determinism).
        # Quarantined hosts are excluded here (anti-join) rather than by the
        # budget join, so hosts OUTSIDE the dimension can safely fall back to
        # the default budget — the same default the simulator applies.
        eligible = (
            self._pending()
            .filter(F.col("discovered_round") < round_no)
            .join(F.broadcast(quarantined), "host", "left_anti")
        )
        candidates = politeness.robots_filter(eligible, self.hosts)
        # pending = |frontier| − |seen| upper-bounds the round's schedulable
        # rows and is already known driver-side (no job) — it elects the
        # budget-rank form here and the fetch-join/verify paths below.
        pending_bound = self._remaining()
        # Single-window budget rank for driver-known-small rounds: the
        # skew-safe two-stage form exists for frontier-scale inputs (a hot
        # host funneling 10^10 rows through one window task); a politeness-
        # bounded steady round is at most `pending_bound` rows, so when that
        # bound is broadcast-class small the salt-shard pre-rank only adds
        # an exchange+sort per round. Byte-identical output by construction
        # (stage 1 keeps a superset of stage 2's winners; tested in
        # tests/test_streaming_units.py).
        small_round = (
            pending_bound is not None and pending_bound <= self.broadcast_schedule_max
        )
        selected = politeness.budget_rank(
            candidates, budgets, default_budget=politeness.DEFAULT_TOKEN_RATE,
            two_stage=not small_round,
        )
        # Materialize the schedule NOW, with one job: the fetch plan below
        # references `selected` from several independent AQE stage jobs
        # (the slim broadcast build, the miss anti-join's left side, the
        # hit-hash broadcast), and AQE launches them CONCURRENTLY — under a
        # bare .cache() each raced the cache fill and recomputed the
        # budget-rank window pipeline from scratch (event-log profile: SIX
        # simultaneous window-pipeline jobs in round 1, three per steady
        # round). Eager localCheckpoint over cache+count: same single job,
        # but it also TRUNCATES the logical plan that every downstream
        # analysis re-walks (paired A/B both orders: steady rounds ~1.9 s
        # vs ~2.3 s). Blocks are reclaimed by the ContextCleaner when the
        # round's DataFrame goes out of scope — the same lifecycle as the
        # pending fold's checkpoints; on a cluster swap for reliable
        # checkpoint(dir) if executor loss must not fail the round.
        selected = selected.localCheckpoint(eager=True)

        # Synthetic fetch (north_rule): frontier ⋈ images on image_id.
        # Join direction matters enormously: a plain shuffle join moves the
        # image PAYLOAD BYTES through the exchange (disk-bound, doesn't
        # scale with cores — measured flat 85s/round at local[8] and
        # local[32]). The politeness budget bounds |selected| per round
        # (hosts × token_rate), so broadcast the slim selected side into
        # the images scan: bytes flow scan → verify → sink with no shuffle.
        # At extreme host counts (|selected| too big to broadcast) the
        # scale path is bucketing both tables by image_id (co-located
        # join, Iceberg bucket(N)) — same plan property: bytes don't move.
        out_cols = ["image_id", "url_hash", "canonical_url", "host", "host_rank"]
        slim = selected.select(*out_cols)  # join only what the output needs
        if self.fetch_join == "broadcast":
            use_broadcast = True
        elif self.fetch_join == "shuffle":
            use_broadcast = False
        else:
            # Shuffle is only legal when the images layout was asserted
            # (see __init__).
            use_broadcast = not (
                self.images_bucketed
                and pending_bound is not None
                and pending_bound > self.broadcast_schedule_max
            )
            if (
                use_broadcast
                and not self.images_bucketed
                and pending_bound is not None
                and pending_bound > self.broadcast_schedule_max
                and not getattr(self, "_warned_big_broadcast", False)
            ):
                self._warned_big_broadcast = True  # once per engine
                # no legal fallback exists without an image_id layout (a
                # plain shuffle join would move payload bytes through the
                # exchange), so warn instead of silently building a
                # broadcast hash relation of this cardinality on every
                # executor — observed OOMing a 16 GB executor at ~1M rows
                import sys

                print(
                    f"WARNING: fetch join broadcasting a schedule bounded "
                    f"by {pending_bound} rows (> broadcast_schedule_max="
                    f"{self.broadcast_schedule_max}); executors must hold "
                    f"the full hash relation. For bulk drains, lay images "
                    f"out by image_id (images_bucketed / images_n_buckets) "
                    f"so the shuffle-hash or pruned path applies.",
                    file=sys.stderr,
                )
        images_src = (
            self._prune_images_for(slim) if self.images_n_buckets else self.images
        )
        if use_broadcast:
            hit = images_src.join(F.broadcast(slim), "image_id")
        else:
            # shuffle-hash: slim is the build side (its exchange is the only
            # one — fully parallel); the images side streams from its
            # existing image_id hash partitioning with no exchange
            hit = images_src.join(slim.hint("shuffle_hash"), "image_id")
        # Fetch-miss detection bounded by the SCHEDULE, not the images table:
        # miss = slim ∖ hit.url_hash. Both anti-join sides are politeness-
        # bounded (|hit| ≤ |slim|), so in the broadcast regime the anti has
        # no exchange at all; the only extra images touch is a column-pruned
        # id-only re-derivation of `hit`, which rides the same (pruned) scan
        # shape as the fetch join itself. The previous form (slim anti-join
        # the FULL images id column) shuffled the 10^10-row id column every
        # round — even when misses were rare. In the shuffle regime the
        # schedule was judged too big to broadcast, so hit.url_hash (same
        # cardinality) must not be broadcast either: both sides shuffle —
        # two schedule-bounded exchanges, still never touching images.
        hit_hashes = hit.select("url_hash")
        if use_broadcast:
            hit_hashes = F.broadcast(hit_hashes)
        miss = slim.join(hit_hashes, "url_hash", "left_anti")
        # null-stamp every non-key images column in ONE select (a
        # withColumn per column is a py4j round trip + plan node each —
        # pure plan-phase driver time at zero semantic gain)
        miss = miss.select(
            "*",
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in self.images.dtypes
                if c != "image_id"
            ],
        )
        fetched = hit.unionByName(miss).withColumn(
            "status",
            F.when(_error_expr(round_no, self.error_permille), F.lit("blocked"))
            .when(F.col("caption").isNull(), F.lit("missing"))
            .otherwise(F.lit("ok")),
        )
        fetched = fetched.select(
            "url_hash", "canonical_url", "host", "image_id",
            F.lit(round_no).alias("fetch_round"),
            F.col("host_rank").cast("long").alias("fetch_seq"),
            "status",
            F.when(F.col("status") == "ok", F.col("bytes")).alias("bytes"),
            F.when(F.col("status") == "ok", F.col("caption")).alias("caption"),
            F.when(F.col("status") == "ok", F.col("phash")).alias("phash"),
            F.pmod(F.xxhash64("host"), F.lit(N_LINEAGE_BUCKETS)).cast("int").alias("partition_id"),
        )
        # Slim stats plan, captured BEFORE the verify join: every post-
        # append consumer (host state machine, lineage, discovery, pending
        # fold) needs only (url_hash, host, status, fetch_seq), and none
        # needs `verified` — capturing here keeps the expensive verify
        # subtree (payload bytes through the Python boundary) out of the
        # stats-side plans entirely (an outer join is not prunable away).
        stats_src = fetched
        est_row_bytes = self._avg_image_row_bytes() if self.verify_payloads else None
        inline_verify = (
            self.inline_verify_max > 0  # 0 = slim everywhere (A/B knob)
            and pending_bound is not None
            and (
                pending_bound <= self.inline_verify_max
                or (
                    est_row_bytes is not None
                    and pending_bound * est_row_bytes <= self.inline_verify_bytes
                )
            )
        )
        if self.verify_payloads and inline_verify:
            # Small-round INLINE path: the verdict is computed directly in
            # the append plan — one job instead of a separate verify-
            # broadcast job per round. The tri-state UDF already matches
            # the reconstructed column exactly (None for null bytes/phash,
            # False for rejected, True otherwise). Safe only when the
            # politeness-bounded round is small: ArrowEvalPython buffers
            # its child rows (payload bytes included) in a per-task JVM
            # queue while Python round-trips, so the queue is bounded by
            # ~(pending_bound / tasks) x payload size here; big rounds take
            # the slim-projection path below, whose queue rows are ~30
            # bytes. Steady politeness rounds are the common case — this
            # removes one full images-source traversal per round.
            if self._verify_fn is None:
                self._verify_fn = _verify_udf()
            verify = self._verify_fn
            fetched = fetched.withColumn(
                "verified",
                verify(
                    F.col("image_id"), F.col("bytes"), F.col("caption"),
                    F.col("phash").cast("string"),
                ),
            )
        elif self.verify_payloads:
            # The verify UDF runs over a SLIM projection and only FAILING
            # url_hashes are joined back (broadcast — normally empty).
            # Rationale: ArrowEvalPython buffers every child row in a JVM
            # row queue while Python round-trips; with the UDF inline in the
            # full-row plan that queue holds the payload BYTES (~10 GB/round
            # at bench scale) and spills to the single local disk — measured
            # 45 s vs 18 s for the identical verify work, and the spill is
            # core-count-independent (it throttled 8→32-core scaling). With
            # the slim projection the queue holds ~30 bytes/row and the
            # bytes flow scan → write entirely JVM-side. Verification
            # arithmetic is unchanged; `verified` is reconstructed as:
            # NULL for unfetched rows (bytes null), false iff the verifier
            # rejected the row, else true.
            if self._verify_fn is None:
                self._verify_fn = _verify_udf()
            verify = self._verify_fn
            failed = (
                fetched.select(
                    "url_hash",
                    verify(
                        F.col("image_id"), F.col("bytes"), F.col("caption"),
                        F.col("phash").cast("string"),
                    ).alias("__v"),
                )
                .filter(F.col("__v") == False)  # noqa: E712 — tri-state: keep strictly-false
                .select("url_hash")
                .withColumn("__failed", F.lit(True))
            )
            fetched = fetched.join(F.broadcast(failed), "url_hash", "left").withColumn(
                "verified",
                F.when(F.col("bytes").isNull(), F.lit(None).cast("boolean"))
                # no reference phash → unverifiable, NOT verified=true (the
                # UDF returns None for these rows, so they never reach the
                # strictly-false failed set; without this branch they would
                # be silently upgraded from NULL to true)
                .when(F.col("phash").isNull(), F.lit(None).cast("boolean"))
                .when(F.coalesce(F.col("__failed"), F.lit(False)), F.lit(False))
                .otherwise(F.lit(True)),
            ).drop("__failed")
        else:
            fetched = fetched.withColumn("verified", F.lit(None).cast("boolean"))
        # pin column order (the verify join reorders): parquet readers take
        # the first data file's schema, so every append must agree
        fetched = fetched.select(
            "url_hash", "canonical_url", "host", "image_id", "fetch_round",
            "fetch_seq", "status", "bytes", "caption", "phash", "partition_id",
            "verified",
        )
        if not self.store_payloads:
            # bytes were still fetched and verified above; they are just not
            # persisted in the committed table
            fetched = fetched.withColumn("bytes", F.lit(None).cast("binary"))
        # NOT coalesced to the round's row bound: an A/B (profile4, this
        # round) measured coalescing the politeness-bounded append to
        # ~rows/8k tasks at 3x SLOWER steady rounds (1.2 → 3.5 s) — the
        # stage's cost is the full images-cache scan feeding the join, not
        # per-task overhead, and coalesce throttles exactly that scan's
        # parallelism. The ~96 small output files per round are bounded by
        # #rounds x parallelism and compacted by Table.compact if needed.
        # Round stats ride the fetched append via an Observation — zero
        # extra jobs (previously a separate .first() aggregation job per
        # round, one of the core-count-independent per-round barriers).
        from pyspark.sql import Observation

        obs = Observation()
        fetched = fetched.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
        )
        # Commit protocol (ST2): data first, ledger last. The ledger commit
        # is the round barrier — a crash in between leaves data for a round
        # the ledger doesn't know about, and the guards below make the
        # re-run skip the (byte-identical, deterministic) appends, so a
        # resumed run converges to exactly the uninterrupted tables. Only a
        # freshly (re)started process can be in that half-committed state,
        # so steady-state rounds skip the probes.
        already_written = (
            self._fresh_process
            and self.fetched.exists()
            and self.fetched.read(self.spark).filter(F.col("fetch_round") == round_no).limit(1).count() > 0
        )
        already_alerted = (
            self._fresh_process
            and self.alerts.exists()
            and self.alerts.read(self.spark).filter(F.col("round") == round_no).limit(1).count() > 0
        )
        self._fresh_process = False
        # deferred-ledger barrier: the previous round's ledger commit ran
        # while this round's plan was built above; it must land before this
        # round's first table write (any residual wait lands in "plan")
        self._await_ledger()
        mark("plan")
        sc.setJobDescription(f"crawl r{round_no} fetch_commit")

        # The slim stats projection every post-append consumer reads
        # (url_hash, host, status, fetch_seq — none needs `verified` or the
        # payload). It is derived from the round's COMMITTED rows, not by
        # re-deriving the fetch-join plan: the two commit branches below run
        # concurrently, and when stats was a cached re-derivation they raced
        # the cache fill and each re-ran the pruned fetch join (event-log
        # profile: two simultaneous 96-task jobs per round). Reading the
        # just-appended data dir back is a tiny column-pruned parquet scan
        # of exactly this round's rows — identical data by the determinism
        # contract, no recompute, no cache to manage.
        stats_cols = ["url_hash", "host", "status", "fetch_seq"]
        if os.environ.get("FCS_EXPLAIN_DIR"):
            # debug/audit hook (guide §1): dump the round's append plan
            d = os.environ["FCS_EXPLAIN_DIR"]
            os.makedirs(d, exist_ok=True)
            plan = self.spark.sparkContext._jvm.PythonSQLUtils.explainString(
                fetched._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(d, f"fetch_r{round_no:03d}.txt"), "w") as fh:
                fh.write(plan)
        if not already_written:
            # The append IS the round's materializing action: it fills the
            # stats Observation in the same job. An empty round's append is
            # a commit-level no-op (Table.append skips part-less writes),
            # so no pre-count is needed.
            self.fetched.append(fetched)
            n_sched = int(obs.get["n"] or 0)
            n_ok = int(obs.get["ok"] or 0)
            rd_dir = self.fetched.last_appended_dir
            if rd_dir is not None:
                stats = self.spark.read.parquet(rd_dir).select(*stats_cols)
            else:  # empty round: no consumer executes this plan (n_sched=0)
                stats = stats_src.select(*stats_cols)
        else:
            # resume re-run: this round's rows are already committed — read
            # them back from the table (same rows the append would produce)
            stats = (
                self.fetched.read(self.spark)
                .filter(F.col("fetch_round") == round_no)
                .select(*stats_cols)
            )
            agg = stats.agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
            ).first()
            n_sched = int(agg.n)
            n_ok = int(agg.ok) if agg.ok is not None else 0
        mark("fetch_commit")

        # per-host outcome for the quarantine state machine
        # ONE aggregation of the round's 10^5-10^6 committed rows serves
        # both per-round consumers: the host state machine reads it directly
        # and the lineage ledger derives from its ~|hosts| rows
        # (partition_id is a pure function of host, so regrouping the host
        # rows by it is exact) — previously each consumer re-aggregated the
        # full round, one extra shuffle job per round.
        host_agg = stats.groupBy("host").agg(
            F.count("*").alias("n_items"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok_cnt"),
            F.max(F.when(F.col("status") == "ok", F.col("fetch_seq"))).alias("last_ok"),
        ).cache()  # ~|hosts| rows; materialized by the state overwrite job
        per_host = host_agg.select(
            "host",
            "n_items",
            (F.col("n_items") - F.coalesce(F.col("last_ok"), F.lit(0))).cast("int").alias("trailing_blocked"),
            F.col("last_ok").isNotNull().alias("any_ok"),
        )
        new_state = politeness.update_host_state(state, per_host)
        # Quarantine-transition channel (the reference's proxy-ban alert,
        # utils/aleritna.py:28-43): flag hosts whose quarantined bit flips
        # this round. The transition count rides the host_state overwrite
        # via a second Observation; the (rare) alert append only runs on
        # rounds where a flip actually happened.
        was_q = state.select("host", F.col("quarantined").alias("__was_q"))
        staged_state = new_state.join(F.broadcast(was_q), "host", "left").withColumn(
            "__is_trans",
            F.col("quarantined") & ~F.coalesce(F.col("__was_q"), F.lit(False)),
        )
        state_obs = Observation()
        staged_state = staged_state.observe(
            state_obs, F.sum(F.col("__is_trans").cast("int")).alias("n_trans")
        )

        lineage = host_agg.withColumn(
            "partition_id",
            F.pmod(F.xxhash64("host"), F.lit(N_LINEAGE_BUCKETS)).cast("int"),
        ).groupBy("partition_id").agg(
            F.sum("n_items").alias("scheduled"),
            F.sum("ok_cnt").alias("fetched"),
            F.sum(F.col("n_items") - F.col("ok_cnt")).alias("errors"),
            F.count("*").alias("hosts_touched"),
        ).select(
            F.lit(round_no).alias("round"), "partition_id", "scheduled", "fetched",
            "errors", "hosts_touched", F.current_timestamp().alias("committed_at"),
        )

        # Commit overlap: the three post-fetch branches are mutually
        # independent, so they run in two concurrent threads —
        #   A: host_state overwrite (+ the rare alert append)
        #   B: discovery expansion, THEN the seen-set accumulate (B keeps
        #      the old sequential order internally: the drained-frontier
        #      check reads the post-discovery frontier count)
        # — and the LEDGER append stays strictly AFTER both: it is the round
        # barrier, and committing it before any data/state write could
        # finish would let a crash strand a "committed" round with missing
        # data. Each branch already tolerates being the only one to land
        # before a crash (state: pinned-version walk-back; discovery:
        # idempotent dedup + discovered_round filter; seen: in-memory only).
        # Spark job submission is thread-safe; the tables are distinct
        # directories; the ~0.5-1 s/branch of driver-side commit tail
        # (manifest write, file moves) now overlaps instead of summing.
        def _branch_state() -> int:
            sc.setJobDescription(f"crawl r{round_no} state")
            if n_sched == 0:
                return 0
            # host_state.overwrite is deterministic given the PINNED state
            # input (see round start), so it runs unconditionally on
            # re-runs; the commit meta records which round it belongs to.
            self.host_state.overwrite(
                staged_state.select(
                    "host", "token_rate", "ban_threshold", "consecutive_errors", "quarantined"
                ),
                meta={"round": round_no},
            )
            n = int(state_obs.get["n_trans"] or 0)
            if n and not already_alerted:
                self.alerts.append(
                    staged_state.filter("__is_trans").select(
                        F.lit(round_no).alias("round"),
                        "host",
                        "consecutive_errors",
                        F.lit("ban_threshold_reached").alias("reason"),
                    )
                )
            return n

        def _branch_disc_seen() -> int:
            sc.setJobDescription(f"crawl r{round_no} disc+seen")
            n_d = 0
            if self.discovery is not None and n_ok > 0:
                # before the ledger barrier (see _expand_discoveries
                # docstring); the slim stats cache carries exactly the
                # (url_hash, status) columns discovery consumes
                n_d = self._expand_discoveries(selected, stats, round_no)
            if n_ok > 0:
                if (
                    self._frontier_rows is not None
                    and (self._seen_rows or 0) + n_ok >= self._frontier_rows
                ):
                    # this round drained the frontier: no later round will
                    # need the maintained pending set, so skip the final
                    # fold/localCheckpoint (a core-count-independent
                    # per-run flat cost). Drop the handles instead of
                    # leaving them stale — _pending() rebuilds exactly from
                    # the tables (the resume path) if anyone asks again.
                    if self._pending_df is not None and self._pending_df is not self._frontier_df:
                        self._pending_df.unpersist()
                    self._pending_df = None
                    if self._pending_add is not None:
                        self._pending_add.unpersist()
                        self._pending_add = None
                    self._seen_df = None
                else:
                    # fold while this round's slim stats are still cached
                    ok_h = stats.filter(F.col("status") == "ok").select("url_hash")
                    self._fold_pending(ok_h)
            return n_d

        pool = self._commit_pool()
        fut_state = pool.submit(_branch_state)
        fut_disc = pool.submit(_branch_disc_seen)
        n_alerts = fut_state.result()
        n_disc = fut_disc.result()
        mark("state_disc_seen")

        def _append_ledger() -> None:
            # the round caches stay alive until the append lands (lineage
            # reads host_agg reads fetched); cleanup rides the same unit so
            # the deferred path can't unpersist under an in-flight append
            sc.setJobDescription(f"crawl r{round_no} ledger")
            try:
                if n_sched > 0:
                    self.ledger.append(lineage)
                else:
                    empty = self.spark.createDataFrame(
                        [(round_no, -1, 0, 0, 0, 0)],
                        "round int, partition_id int, scheduled bigint, fetched bigint, errors bigint, hosts_touched bigint",
                    ).withColumn("committed_at", F.current_timestamp())
                    self.ledger.append(empty)
            finally:
                host_agg.unpersist()
                # every consumer of this round's bloom/cuckoo broadcasts is
                # checkpoint-truncated (pending fold) or fully materialized
                # — safe to let the ContextCleaner reclaim them. The next
                # round appends no new refs before _await_ledger (blooms
                # run post-fetch, and the fetch waits on this future).
                self._bc_refs.clear()

        if defer_ledger:
            # run()-only overlap: the commit tail lands while the NEXT
            # round plans; _await_ledger() (before that round's first
            # write, and at the end of run()) is the barrier
            self._ledger_fut = pool.submit(_append_ledger)
        else:
            _append_ledger()
        mark("ledger")
        self._round = round_no
        self._seen_rows = (self._seen_rows or 0) + n_ok
        return {
            "round": round_no,
            "scheduled": n_sched,
            "fetched": n_ok,
            "discovered": n_disc,
            "quarantine_alerts": n_alerts,
            "timings": tmark,
        }

    def _avg_image_row_bytes(self) -> float | None:
        """Catalyst's bytes-per-row estimate for the images plan, or None.

        A cached-and-materialized images table exposes an exact rowCount in
        its statistics (the common bench/production shape); a bare file
        scan usually exposes sizeInBytes only, in which case the verify
        election falls back to the conservative row bound. Computed once
        per engine (pure driver-side metadata; no job)."""
        if self._img_row_bytes != "unset":
            return self._img_row_bytes  # type: ignore[return-value]
        est: float | None = None
        try:
            stats = self.images._jdf.queryExecution().optimizedPlan().stats()
            rc = stats.rowCount()
            if rc.isDefined():
                rows = int(rc.get().toString())
                size = int(stats.sizeInBytes().toString())
                if rows > 0:
                    est = size / rows
        except Exception:
            est = None
        self._img_row_bytes = est
        return est

    def _remaining(self) -> int | None:
        """|frontier| − |seen|: pending work, known driver-side without a
        job. The seed/discovery counts ride existing writes as Observations;
        a resumed engine reconstructs the frontier count once (parquet
        footer scan). Exact because fetched-ok URLs are never rescheduled
        and seen ⊆ frontier by construction."""
        if self._frontier_rows is None:
            if not self.frontier.exists():
                return None
            self.committed_round()  # populate _seen_rows from the ledger
            self._frontier_rows = self.frontier.read(self.spark).count()
        return self._frontier_rows - (self._seen_rows or 0)

    def run(self, max_rounds: int = 1000) -> list[dict[str, int]]:
        """Drive rounds until the frontier is drained (or only quarantined/
        permanently-failing work remains). `remaining == 0` short-circuits
        WITHOUT a probe round: the terminal all-seen round used to pay a
        bloom build over the full seen set, a worst-case (everything lands
        in `maybe`) anti-join, and an empty commit — per-run flat cost that
        the N→4N scaling efficiency is directly sensitive to. Rounds where
        remaining > 0 but nothing is schedulable (quarantined hosts,
        robots-blocked URLs) still terminate via scheduled == 0 as before."""
        stats = []
        if (
            self.prebuild_bloom
            and self.discovery is not None
            and self._frontier_bloom is None
            and self.frontier.exists()
        ):
            # Cold-start overlap (SURVEY round-4 open item): the
            # whole-frontier discovery bloom and round 1's other startup
            # jobs (the resume-path pending rebuild, or a fresh run's first
            # fetch) are independent full scans — stage the bloom build in
            # the engine pool so they overlap instead of serializing.
            # Correctness is unchanged: the frontier table cannot gain rows
            # between here and round 1's dedup (children append later in
            # the same round), and _expand_discoveries drains the future
            # before first use. Materialize the lazy shared handles on THIS
            # thread first so the pool thread doesn't race the caches; a
            # drained crawl (remaining == 0) skips the build outright.
            if self._remaining():
                self._frontier()
                self._bloom_prebuild = self._commit_pool().submit(self._discovery_bloom)
        try:
            for _ in range(max_rounds):
                if self._remaining() == 0:
                    break
                s = self.run_round(defer_ledger=True)
                stats.append(s)
                if s["scheduled"] == 0:
                    break
        finally:
            # the last round's deferred ledger must land before run()
            # returns — callers (and a successor engine on this workdir)
            # read the ledger as the committed-round source of truth
            self._await_ledger()
        return stats

    # ------------------------------------------------------------- outputs
    def crawl_order(self) -> DataFrame:
        """(round, host, url_hash, host_rank) of successful fetches — the
        north_rule crawl-ordering artifact, compared against the simulator."""
        return (
            self.fetched.read(self.spark)
            .filter(F.col("status") == "ok")
            .select(
                F.col("fetch_round").alias("round"), "host",
                F.col("fetch_seq").alias("host_rank"), "url_hash",
            )
        )

    def seen_set(self) -> DataFrame:
        return self.fetched.read(self.spark).filter("status = 'ok'").select("url_hash").distinct()
