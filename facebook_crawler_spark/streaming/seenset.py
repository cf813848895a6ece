"""Distributed URL-seen set: partition-local bloom filters OR-reduced into
a global filter, broadcast back as a prefilter (north_star; SURVEY.md M5).

Correctness is never probabilistic: the bloom splits candidates into
"definitely unseen" (bypass) and "maybe seen" (exact anti-join) — false
positives only route a few extra rows through the exact join, they can
never drop an unseen URL or re-admit a seen one. At 10^10 URLs the bloom
keeps ~99% of new URLs out of the anti-join shuffle; the exact join
backstop touches only the maybe-seen sliver.

Hashing: k positions derived from the already-uniform url_hash via
(h1 + i*h2) double hashing — pure modular arithmetic, reproducible in any
engine. The filter is a numpy bit array; per-partition build runs in
mapInPandas (Arrow), the OR-reduce collects one m/8-byte row per partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOD = (1 << 63) - 25  # largest prime < 2^63 (keeps JVM/ANSI-safe long math)
_MOD_U = np.uint64(MOD)
_KNUTH_HI = np.uint64(0x9E3779B97F4A7C15 >> 32)
_KNUTH_LO = np.uint64(0x9E3779B97F4A7C15 & 0xFFFFFFFF)
_SALT = np.uint64(0x85EBCA6B)


_C32 = np.uint64(0xFFFFFFFF)
_FIFTY = np.uint64(50)  # 2^64 ≡ 50 (mod MOD), because 2·MOD = 2^64 − 50
_CARRY_TERM = np.uint64((50 << 32) % MOD)  # 2^96 ≡ 50·2^32 (mod MOD)


def _h1h2(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact (h1, h2) = (|h| % MOD, (h1*KNUTH + SALT) % MOD) of the int64
    url_hash, fully vectorized in uint64 (the previous object-dtype big-int
    path was a per-element Python loop in disguise). The 128-bit product
    h1*KNUTH is computed by 32-bit limb splitting — every partial product
    fits 64 bits exactly — and reduced loop-free via 2^64 ≡ 50 (mod MOD).
    Bit-identical to the big-int formulation (property-tested in
    tests/test_streaming_units.py)."""
    hi64 = h.astype(np.int64)
    hu = hi64.view(np.uint64)
    # exact |h|, including int64 min (two's-complement negate in uint64)
    absu = np.where(hi64 < 0, np.uint64(0) - hu, hu)
    h1 = absu % _MOD_U
    s32 = np.uint64(32)
    a_hi = h1 >> s32  # < 2^31
    a_lo = h1 & _C32
    ll = a_lo * _KNUTH_LO  # < 2^64, exact
    lh = a_lo * _KNUTH_HI  # < 2^64, exact
    hl = a_hi * _KNUTH_LO  # < 2^63, exact
    hh = a_hi * _KNUTH_HI  # < 2^63, exact
    mid = hl + lh  # may wrap exactly once
    carry = (mid < hl).astype(np.uint64)
    # h1*KNUTH = hh·2^64 + mid·2^32 + carry·2^96 + ll, reduced term-wise:
    # mid·2^32 ≡ (mid_lo << 32) + 50·mid_hi  (both summands < 2^64 exact)
    mid_term = (((mid & _C32) << s32) % _MOD_U + _FIFTY * (mid >> s32)) % _MOD_U
    # 50·hh with hh < 2^63: split hh = p·2^32 + q, then 50p < 2^37 so
    # 50p·2^32 ≡ ((50p)_lo << 32) + 50·(50p >> 32), all exact
    fp_ = _FIFTY * (hh >> s32)
    hh_term = (
        (((fp_ & _C32) << s32) % _MOD_U + _FIFTY * (fp_ >> s32)) % _MOD_U
        + _FIFTY * (hh & _C32)
    ) % _MOD_U
    acc = (ll % _MOD_U + mid_term) % _MOD_U
    acc = (acc + hh_term) % _MOD_U
    acc = (acc + carry * _CARRY_TERM) % _MOD_U
    h2 = (acc + _SALT) % _MOD_U
    return h1, h2


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing of the int64 url_hash."""
    h1, h2 = _h1h2(h)
    cols = []
    acc = h1
    for _ in range(k):
        cols.append((acc % np.uint64(m_bits)).astype(np.int64))
        acc = (acc + h2) % _MOD_U  # stays (h1 + i*h2) % MOD, no wrap
    return np.stack(cols, axis=1)


def build_bloom(
    df: DataFrame,
    hash_col: str = "url_hash",
    m_bits: int = 1 << 20,
    k: int = 5,
    tree_fanin: int = 64,
    direct_collect_max: int = 256 << 20,
) -> bytes:
    """Build the global bloom over `df[hash_col]`.

    Each partition builds a local m-bit array (mapInPandas). The OR-reduce
    then runs one of two ways, picked by the driver-collect bound:

    - **direct** (#partitions × m/8 ≤ `direct_collect_max`): the driver
      collects one m/8-byte row per partition and ORs them — no exchange,
      right at sandbox scale (32 × 1 MiB = 32 MiB).
    - **tree** (beyond the bound): fixed-fan-in repartition + in-partition
      OR stages until one row remains, so the driver collects exactly m/8
      bytes no matter how many partitions built blooms. Each stage's
      exchange ships ⌈rows/fanin⌉ × m/8 bytes spread across executors —
      the P × m/8 total still moves, but never through the driver. This is
      what keeps the build viable when m is sized for a 10^10-key frontier
      (the old driver fold collected terabytes at that scale; see
      round_runner._discovery_bloom for the matching cap on m itself).

    The result is bit-identical between the two paths (OR is associative/
    commutative and positions depend only on (hash, m, k)) — property-
    tested in tests/test_streaming_units.py.
    """
    n_bytes = m_bits // 8

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            touched = True
            pos = _positions(pdf[hash_col].to_numpy(), m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if touched:
            yield pd.DataFrame({"bloom": [bits.tobytes()]})

    def or_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            for buf in pdf["bloom"]:
                a = np.frombuffer(buf, dtype=np.uint8)
                acc = a.copy() if acc is None else acc | a
        if acc is not None:
            yield pd.DataFrame({"bloom": [acc.tobytes()]})

    blooms = df.select(hash_col).mapInPandas(per_partition, "bloom binary")
    nparts = max(1, blooms.rdd.getNumPartitions())
    if nparts * n_bytes > direct_collect_max:
        est = nparts
        while est > 1:
            est = -(-est // tree_fanin)  # ceil
            blooms = blooms.repartition(est).mapInPandas(or_partition, "bloom binary")
    parts = blooms.collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bloom, dtype=np.uint8)
    return out.tobytes()


def split_by_bloom(
    candidates: DataFrame,
    bloom: bytes,
    hash_col: str = "url_hash",
    m_bits: int = 1 << 20,
    k: int = 5,
    ref_holder: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(definitely_unseen, maybe_seen) — maybe_seen still needs the exact
    anti-join; definitely_unseen provably has no match in the seen set.

    `ref_holder`: the UDF is serialized with the broadcast's ID only — no
    strong reference survives pickling — so if the returned plans stay lazy
    (or a cached partition is evicted and recomputed) after this Python
    Broadcast wrapper is GC'd, the ContextCleaner may have destroyed the
    blocks ("Block broadcast_N does not exist"). Callers that keep lazy
    plans alive must pass a list; the broadcast is appended and stays
    referenced until the caller clears it (CrawlEngine clears per round,
    after every consumer plan has been checkpoint-truncated)."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(bloom)
    if ref_holder is not None:
        ref_holder.append(bc)
    n_bytes = m_bits // 8

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        assert len(bits) == n_bytes
        pos = _positions(h.to_numpy(), m_bits, k)
        hit = np.ones(len(h), dtype=bool)
        for i in range(pos.shape[1]):
            p = pos[:, i]
            hit &= (bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(hit)

    flagged = candidates.withColumn("__maybe", maybe_seen(F.col(hash_col)))
    return (
        flagged.filter(~F.col("__maybe")).drop("__maybe"),
        flagged.filter(F.col("__maybe")).drop("__maybe"),
    )


# ---------------------------------------------------------------------------
# Cuckoo-filter variant (north_star: "merged via OR-reduce into a global
# cuckoo filter"). Same routing contract as the bloom — (definitely_unseen,
# maybe_seen), false positives only cost exact-join rows — but with a far
# lower false-positive rate per bit (~8 × 2^-16 ≈ 1.2e-4 at 4-slot buckets
# and 16-bit fingerprints vs ~1% for the same-size bloom), so the maybe-seen
# sliver that reaches the anti-join shuffle is ~100x smaller.
#
# Build trade-off, stated honestly: a cuckoo table cannot be OR-merged the
# way bloom bitmaps can (insertion does evictions), so the distributed build
# collects per-partition DEDUPLICATED (bucket, fingerprint) pairs — a
# collect proportional to the seen-set size (8 bytes/key), not to a fixed
# filter size. That bounds this variant to seen sets whose fingerprint set
# fits the driver (~10^8); beyond that the engine keeps the bloom (fixed
# m/8 × #partitions collect) or shards cuckoo tables per partition range.
# ---------------------------------------------------------------------------

_FP_MUL = 0x5BD1E995


def _cuckoo_parts(h: np.ndarray, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(i1, fp) for each int64 hash; fp is uint16 and never 0 (0 = empty)."""
    h1, h2 = _h1h2(h)
    fp = (h2 >> np.uint64(20)) & np.uint64(0xFFFF)
    fp = np.where(fp == 0, 1, fp).astype(np.uint16)
    i1 = (h1 % np.uint64(n_buckets)).astype(np.int64)
    return i1, fp


def _alt_bucket(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key alternate bucket: i ^ (mix(fp) masked). n_buckets must be
    a power of two so the XOR is an involution (alt(alt(i)) == i)."""
    return i ^ ((fp.astype(np.int64) * _FP_MUL) & (n_buckets - 1))


def build_cuckoo(
    df: DataFrame, hash_col: str = "url_hash", n_buckets: int = 1 << 17, slots: int = 4
) -> bytes:
    """Build a global cuckoo filter over df[hash_col].

    Per-partition mapInPandas emits deduplicated (bucket, fp) pairs; the
    driver places them with the standard evict loop (vectorized first-choice
    pass, Python loop only for the overflow tail). Raises if load exceeds
    capacity — callers size n_buckets ≥ n_keys / (slots × 0.95).
    """
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = []
        for pdf in batches:
            if len(pdf):
                i1, fp = _cuckoo_parts(pdf[hash_col].to_numpy(), n_buckets)
                acc.append(np.stack([i1, fp.astype(np.int64)], axis=1))
        if acc:
            pairs = np.unique(np.concatenate(acc), axis=0)
            yield pd.DataFrame({"pairs": [pairs.astype(np.int64).tobytes()]})

    rows = df.select(hash_col).mapInPandas(per_partition, "pairs binary").collect()
    if rows:
        pairs = np.unique(
            np.concatenate(
                [np.frombuffer(r.pairs, dtype=np.int64).reshape(-1, 2) for r in rows]
            ),
            axis=0,
        )
    else:
        pairs = np.empty((0, 2), dtype=np.int64)
    if len(pairs) > n_buckets * slots * 0.95:
        raise ValueError(f"cuckoo overfull: {len(pairs)} keys into {n_buckets}x{slots}")

    table = np.zeros((n_buckets, slots), dtype=np.uint16)
    counts = np.zeros(n_buckets, dtype=np.int32)
    i1 = pairs[:, 0]
    fp = pairs[:, 1].astype(np.uint16)
    # vectorized first-choice pass: rank of each key within its i1 bucket
    order = np.argsort(i1, kind="stable")
    ranks = np.empty(len(i1), dtype=np.int64)
    if len(i1):
        sorted_i1 = i1[order]
        start = np.r_[0, np.flatnonzero(np.diff(sorted_i1)) + 1]
        grp = np.repeat(np.arange(len(start)), np.diff(np.r_[start, len(sorted_i1)]))
        ranks[order] = np.arange(len(sorted_i1)) - start[grp]
    direct = ranks < slots
    table[i1[direct], ranks[direct]] = fp[direct]
    np.add.at(counts, i1[direct], 1)
    # overflow tail: classic evict loop (rare at sane load factors)
    for i, f in zip(i1[~direct], fp[~direct]):
        cur_i, cur_f = int(i), int(f)
        for _ in range(1000):
            alt = int(_alt_bucket(np.int64(cur_i), np.uint16(cur_f), n_buckets))
            if counts[alt] < slots:
                table[alt, counts[alt]] = cur_f
                counts[alt] += 1
                break
            # evict a pseudo-random victim (deterministic: slot by fp)
            v = cur_f % slots
            cur_f, table[alt, v] = int(table[alt, v]), cur_f
            cur_i = alt
        else:
            raise ValueError("cuckoo insertion failed; grow n_buckets")
    return table.tobytes()


def split_by_cuckoo(
    candidates: DataFrame,
    table: bytes,
    hash_col: str = "url_hash",
    n_buckets: int = 1 << 17,
    slots: int = 4,
    ref_holder: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(definitely_unseen, maybe_seen) via the broadcast cuckoo table; same
    never-gambles contract — and same broadcast-lifetime contract (see
    split_by_bloom's ref_holder note) — as the bloom variant."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(table)
    if ref_holder is not None:
        ref_holder.append(bc)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        tbl = np.frombuffer(bc.value, dtype=np.uint16).reshape(n_buckets, slots)
        i1, fp = _cuckoo_parts(h.to_numpy(), n_buckets)
        i2 = _alt_bucket(i1, fp, n_buckets)
        hit = (tbl[i1] == fp[:, None]).any(axis=1) | (tbl[i2] == fp[:, None]).any(axis=1)
        return pd.Series(hit)

    flagged = candidates.withColumn("__maybe", maybe_seen(F.col(hash_col)))
    return (
        flagged.filter(~F.col("__maybe")).drop("__maybe"),
        flagged.filter(F.col("__maybe")).drop("__maybe"),
    )
