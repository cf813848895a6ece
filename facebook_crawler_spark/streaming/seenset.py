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


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing of the int64 url_hash."""
    h1 = np.abs(h.astype(np.int64).astype(object)) % MOD
    h2 = (h1 * 0x9E3779B97F4A7C15 + 0x85EBCA6B) % MOD
    return np.stack([(h1 + i * h2) % MOD % m_bits for i in range(k)], axis=1).astype(np.int64)


def build_bloom(df: DataFrame, hash_col: str = "url_hash", m_bits: int = 1 << 20, k: int = 5) -> bytes:
    """Build the global bloom over `df[hash_col]`.

    Each partition builds a local m-bit array (mapInPandas), the driver
    OR-reduces one row per partition — the collect is #partitions × m/8
    bytes, independent of row count.
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

    parts = df.select(hash_col).mapInPandas(per_partition, "bloom binary").collect()
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
) -> tuple[DataFrame, DataFrame]:
    """(definitely_unseen, maybe_seen) — maybe_seen still needs the exact
    anti-join; definitely_unseen provably has no match in the seen set."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(bloom)
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
