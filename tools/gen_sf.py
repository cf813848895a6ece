"""Deterministic sf-scaled measurement dataset generator (round 6).

The driver's own sf1.0 tables (used for BENCH_r05's escalated-scale
rebench) were removed with the testdata reset, and /root/testdata is
read-only — so scale-validation of optimizations needs a stand-in. This
writes a dataset with the SAME schemas, row counts, cardinalities, value
ranges and physical layout (ONE parquet file per table, ~1M-row row
groups — the single-file layout whose scan-parallelism ceiling round 6's
`spread` fix targets) as the driver's generator, reverse-engineered from
the sf0.01/sf0.1 statistics (vocab, lengths, key coverage, label mixes).

NOT for correctness gates (the DuckDB oracle runs on the real testdata);
purely a timing corpus. Never writes into /root/testdata.

Usage: python tools/gen_sf.py [SF] [OUTDIR]
       python tools/gen_sf.py 1.0 /dev/shm/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/dev/shm/sf{SF}"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["FURNITURE", "MACHINERY", "BUILDING", "AUTOMOBILE", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]


def write(name: str, table: pa.Table) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.parquet")
    # one file, big row groups — the driver-layout analog (1-6 row groups)
    pq.write_table(table, path, row_group_size=1_500_000, compression="snappy")
    f = pq.ParquetFile(path)
    print(f"{name}: {f.metadata.num_rows} rows, {f.metadata.num_row_groups} row groups")


def gen_customer(rng: np.random.Generator) -> None:
    n = int(150_000 * SF)
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n)],
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n)]),
    }))


def _ts(rng: np.random.Generator, n: int, lo: str, hi: str) -> pa.Array:
    a = np.datetime64(lo).astype("datetime64[us]").astype(np.int64)
    b = np.datetime64(hi).astype("datetime64[us]").astype(np.int64)
    return pa.array(rng.integers(a, b, n), pa.timestamp("us"))


def gen_orders(rng: np.random.Generator) -> None:
    n = int(1_500_000 * SF)
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, int(150_000 * SF), n), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n)]),
        "o_totalprice": np.round(rng.uniform(800, 500_000, n), 2),
        "o_orderdate": _ts(rng, n, "1995-01-02", "2001-11-04"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n)]),
    }))


def gen_lineitem(rng: np.random.Generator) -> None:
    n = int(6_000_000 * SF)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, int(1_500_000 * SF), n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, int(200_000 * SF), n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, int(10_000 * SF), n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
        "l_quantity": np.round(rng.uniform(1, 50, n), 2),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n), 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n)]),
        "l_shipdate": _ts(rng, n, "1995-01-02", "2001-11-04"),
    }))


def gen_events(rng: np.random.Generator) -> None:
    n = int(1_000_000 * SF)
    ks = rng.integers(0, 100, n)
    write("events", pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": _ts(rng, n, "2024-01-01", "2024-01-31"),
        "user_id": pa.array(rng.integers(0, int(15_000 * SF), n), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n)]),
        "value": np.round(rng.uniform(0, 560, n), 6),
        "props": [f'{{"k": {k}}}' for k in ks],
    }))


def gen_documents(rng: np.random.Generator) -> None:
    n = int(50_000 * SF)
    lens = rng.integers(10, 101, n)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), lens[i])]
        texts.append(" ".join(words))
    # exact-dup rate ~0.16% (sf0.1 measured 8 dup groups / 5000 docs):
    # overwrite a sliver with copies of earlier docs
    n_dup = max(1, n // 600)
    for j in rng.integers(0, n, n_dup):
        texts[int(j)] = texts[int(rng.integers(0, max(1, j)))] if j else texts[0]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n, p=LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in rng.integers(0, 20, n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def gen_embeddings(rng: np.random.Generator) -> None:
    n = int(20_000 * SF)
    vecs = rng.normal(0, 1, (n, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    }))


def main() -> None:
    rng = np.random.default_rng(42)
    gen_customer(rng)
    gen_orders(rng)
    gen_lineitem(rng)
    gen_events(rng)
    gen_documents(rng)
    gen_embeddings(rng)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
