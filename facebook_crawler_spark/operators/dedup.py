"""Deduplication operators for training-data pipelines.

The reference's only dedup is an exact last-wins dict on adId
(reference data_processing/data_processor.py:44-50) — `setalgebra.
dedup_last_wins`. At 100 TB a pipeline needs the near-dup family too; all
of these are first-class engine operators:

- exact dedup by normalized-content hash (hash groupBy);
- MinHash + LSH banding (shingle → minhash → band → bucket join);
- n-gram Jaccard verification (exact, for candidate pairs);
- SimHash (md5 bit-votes + hamming-band join).

Everything compiles to built-in Catalyst expressions (md5, conv,
higher-order array functions) — no Python in any hot path. MinHash and
SimHash default to md5 so the same computation is expressible in ANSI SQL
for the DuckDB oracle; `minhash_lsh_candidates(..., hash_family="xxh")`
runs the identical plan on JVM xxhash64 (long signatures, ~4x cheaper)
when oracle parity is not needed — the production setting.
"""

from __future__ import annotations

import random as _random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from facebook_crawler_spark.operators.partitioning import spread


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def tokens_of(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def shingles(tokens: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string> (empty-safe, distinct).

    Built with k-1 `zip_with` passes instead of a per-position
    `slice`+`concat_ws` lambda: the old transform allocated a fresh
    3-element array per shingle (n-2 slices per doc), the zip form does
    k-1 whole-array passes of plain string concats — measured 2.45 s →
    0.65 s over the 2.6M-shingle benchmark corpus with ZERO differing
    output arrays (same elements, same order; asserted per-id in
    tests/test_dedup.py and by the oracle hash gates).

    Equivalence: after pass j, acc[i] = tokens[i..i+j] joined for every
    i ≤ n-j; entries past n-j join fewer tokens (concat_ws skips the
    nulls zip_with pads with) but the final slice(1, n-k+1) keeps only
    the full-k positions. sequence(1, 0) counts DOWN in Spark, so short
    docs short-circuit to the empty array exactly as before."""
    n = F.size(tokens)
    acc = tokens
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(tokens, j + 1, n - j), lambda x, y: F.concat_ws(" ", x, y)
        )
    return F.when(
        n >= k, F.array_distinct(F.slice(acc, 1, n - (k - 1)))
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def content_hash(text: Column) -> Column:
    """Normalized-content hash (md5 hex) — the exact-dup key.

    NULL text hashes to a sentinel (distinct from empty text): a NULL key
    would never match itself in the dedup semi-join and the row would be
    silently dropped.
    """
    return F.coalesce(F.md5(normalize_text(text)), F.lit("__NULL_TEXT__"))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per normalized content hash.

    ONE shuffle on the content hash, then a rank-1 window — Spark pushes
    the rank ≤ 1 limit below the exchange as WindowGroupLimit on both the
    map and reduce side, so duplicate-heavy data shrinks before the
    exchange exactly like a partial aggregation would, without the second
    plan arm the old groupBy(min)+semi-join shape carried (measured 4.2 s
    → 1.7 s first run, 0.9 → 0.6 s warm at sf1.0; identical rows). The
    input is spread first: the normalize+md5 work is map-side, and a
    single-row-group parquet input would otherwise run it on one core
    (partitioning.py).
    """
    from pyspark.sql import Window

    keyed = spread(df).withColumn("__chash", content_hash(F.col(text_col)))
    w = Window.partitionBy("__chash").orderBy(F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn", "__chash")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# md5u family constants: p prime, (a, b) per seed from a fixed-seed PRNG —
# literal here AND in the generated DuckDB oracle SQL (__spark_entry__), so
# both engines evaluate the identical closed form.
_MH_P = 1_000_000_007
_rng = _random.Random(0x5EED_FACE)
_MH_A = [_rng.randrange(1, _MH_P) for _ in range(64)]
_MH_B = [_rng.randrange(0, _MH_P) for _ in range(64)]
del _rng


def _hash_fn(s: Column, seed: int, family: str = "md5") -> Column:
    """Seeded string hash family.

    - "md5":   md5(s || '#seed') as a hex STRING, lexicographic min — the
               simplest SQL-replayable form, but it pays seed-many md5
               evaluations per shingle and shuffles 32-char strings.
    - "md5u":  per-seed universal-hash permutations over ONE md5: base
               h = int(md5(s)[:12], 16) (48 bits; Catalyst's subexpression
               elimination collapses the repeated md5(s) to one call), then
               g_seed = (a_seed·(h mod p) + b_seed) mod p with p = 10^9+7
               and fixed per-seed constants (_MH_A/_MH_B, seeded PRNG).
               (a·x+b) mod p is pairwise-independent over distinct shingle
               hashes, so each seed draws an effectively independent
               permutation — unlike naive Kirsch-Mitzenmacher double
               hashing h1+k·h2, whose per-seed argmins collapse onto
               argmin(h2) as k grows (measured: 13,820 candidate pairs at
               sf0.1 vs ~256 under independent families). Products stay
               < p² < 2^63: exact int64 on both engines, and exactly
               replayable in DuckDB via ('0x'||substr(md5(x),1,12))::BIGINT
               — the oracle-checkable production family.
    - "xxh":   JVM xxhash64 — cheapest, but not expressible in ANSI SQL
               (rows-only checkable).
    """
    if family == "xxh":
        return F.xxhash64(s, F.lit(seed))
    if family == "md5u":
        h = F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")
        return F.pmod(
            F.lit(_MH_A[seed]) * F.pmod(h, F.lit(_MH_P)) + F.lit(_MH_B[seed]),
            F.lit(_MH_P),
        )
    return F.md5(F.concat(s, F.lit(f"#{seed}")))


def minhash_signature(sh: Column, n_hashes: int = 16) -> Column:
    """array<string> of n minhash values (lexicographic min of seeded md5).

    min(md5(shingle || '#i')) is a valid minwise hash family over the
    shingle set; string-min keeps it expressible in DuckDB SQL for the
    oracle. Empty shingle sets map to a sentinel so they never collide
    with real content.
    """
    return F.array(
        *[
            F.coalesce(
                F.array_min(F.transform(sh, lambda x, i=i: _hash_fn(x, i))),
                F.lit(f"EMPTY#{i}"),
            )
            for i in range(n_hashes)
        ]
    )


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """array<string> of band bucket keys: md5 over each signature slice."""
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.md5(F.concat_ws("|", F.slice(sig, b * rows_per_band + 1, rows_per_band))),
            )
            for b in range(bands)
        ]
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3) -> DataFrame:
    """The ("id", "__sh" array<string>) shingle table — the shared precursor
    of the MinHash signature pipeline and the exact-Jaccard verification.
    Spread (partitioning.py) because everything downstream is map-side.
    Callers running BOTH stages over the same corpus should materialize this
    once (`.localCheckpoint(eager=False)`) and pass it to
    `minhash_lsh_candidates` and `verify_near_dups` — the shingle build is
    the single most expensive projection in the family, and the checkpoint
    halves it (measured 5.3 s → 3.2 s on the 50k-doc benchmark corpus)."""
    src = spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")))
    return src.select("id", shingles(tokens_of(F.col("__text")), shingle_k).alias("__sh"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    hash_family: str = "md5",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band bucket.

    Plan shape: one narrow projection computing signature+bands, an explode
    (bands per row, constant fan-out), a shuffle on the band key, and a
    self-join *within buckets only* — never an all-pairs crossJoin. Bucket
    skew (a degenerate bucket holding half the table) is the risk at scale;
    callers cap bucket width via `max_bucket` in `_pairs_within_buckets`.

    `hash_family`: **"md5u" is the oracle-checkable production family**
    — one md5 per shingle expanded to all n_hashes seeds by per-seed
    universal permutations (see `_hash_fn`), long signatures, exactly
    replayable in DuckDB
    SQL (the registered gate runs it). "xxh" (JVM xxhash64) is cheapest
    of all but only rows-only checkable; "md5" (seed-many md5s, string
    minima) is the legacy simplest-SQL form and remains the default for
    back-compatibility. Measured warm at sf0.1 local[32] (PLANS.md rounds
    4-5): md5 6.80 s, xxh 4.83 s, md5u between — identical plan shape in
    every family. Identical-content duplicates land in the same buckets
    under any family; near-dup candidate sets may differ at the margin
    since the families draw different random permutations.
    """
    rows_per_band = n_hashes // bands
    # Aggregation-shaped minhash (the scale shape): explode shingles, hash
    # each with n flat md5 columns, min-aggregate per doc. Flat expressions
    # stay inside whole-stage codegen (the nested-lambda array form drops
    # Generate into interpreted evaluation — measured 50x slower), and the
    # min() partial-aggregates map-side, so the shuffle carries one row per
    # doc, not one per shingle.
    # the shingle table is spread (partitioning.py) BEFORE the hash compute:
    # it is all map-side (no exchange until the signature agg), so an
    # underpartitioned scan would run it on 1-2 cores. `shingles_df` lets a
    # caller share one materialized shingle table with verify_near_dups.
    sh_df = shingles_df if shingles_df is not None else shingle_table(df, id_col, text_col, shingle_k)
    ex = sh_df.select("id", F.explode_outer("__sh").alias("__shingle"))
    if hash_family == "md5u":
        # materialize the shared 48-bit md5 base ONCE as a named column
        # (not 16 syntactic copies left to codegen subexpression
        # elimination), then expand to the per-seed permutations — same
        # arithmetic, bit-identical values, one md5+conv per shingle
        base = ex.select(
            "id",
            F.pmod(
                F.conv(F.substring(F.md5("__shingle"), 1, 12), 16, 10).cast("long"),
                F.lit(_MH_P),
            ).alias("__hb"),
        )
        hashed = base.select(
            "id",
            *[
                F.pmod(F.lit(_MH_A[i]) * F.col("__hb") + F.lit(_MH_B[i]), F.lit(_MH_P)).alias(f"__h{i}")
                for i in range(n_hashes)
            ],
        )
    else:
        hashed = ex.select(
            "id",
            *[_hash_fn(F.col("__shingle"), i, hash_family).alias(f"__h{i}") for i in range(n_hashes)],
        )
    # empty-doc sentinel: a value outside the family's realistic range so
    # empty shingle sets never bucket with real content (per-seed distinct)
    def _empty(i: int) -> Column:
        if hash_family == "xxh":
            return F.lit((1 << 63) - 1 - i)
        if hash_family == "md5u":
            # above any reachable g_k (< p), distinct per seed, and the
            # same literal the DuckDB oracle coalesces to
            return F.lit(_MH_P + i)
        return F.lit(f"EMPTY#{i}")

    sig = hashed.groupBy("id").agg(
        *[F.coalesce(F.min(f"__h{i}"), _empty(i)).alias(f"__h{i}") for i in range(n_hashes)]
    )
    if hash_family == "xxh":
        band_cols = [
            F.xxhash64(
                F.lit(b), *[F.col(f"__h{b * rows_per_band + j}") for j in range(rows_per_band)]
            )
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.concat(
                F.lit(f"{b}:"),
                F.md5(F.concat_ws("|", *[F.col(f"__h{b * rows_per_band + j}") for j in range(rows_per_band)])),
            )
            for b in range(bands)
        ]
    exploded = sig.select("id", F.explode(F.array(*band_cols)).alias("band"))
    return _pairs_within_buckets(exploded, "band")


def _pairs_within_buckets(df: DataFrame, bucket_col: str, max_bucket: int = 200) -> DataFrame:
    """Distinct (id_a < id_b) pairs co-occurring in a bucket.

    One shuffle: groupBy(bucket) gathers each bucket's ids, pair expansion
    happens inside the grouped row (buckets are capped, so the expansion is
    ≤ max_bucket²/2 per bucket), then a distinct de-dups across bands. A
    bucketed self-join would re-evaluate the (expensive) upstream lineage
    once per side plus once for the width guardrail — three recomputes this
    formulation avoids.

    Buckets wider than `max_bucket` are dropped (degenerate content like
    boilerplate) — the standard LSH guardrail; at 100 TB an unbounded
    bucket would quadratically explode any formulation.
    """
    grouped = df.groupBy(bucket_col).agg(F.collect_set("id").alias("__ids"))
    bounded = grouped.filter(F.size("__ids") <= max_bucket).select(
        F.array_sort("__ids").alias("__ids")
    )
    pairs = bounded.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("__ids"), i + 2, F.size(F.col("__ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.id_a"), F.col("p.id_b")).distinct()


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard similarity of two shingle arrays (0.0 for both-empty)."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verify_near_dups(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Filter candidate pairs by exact n-gram Jaccard ≥ threshold.

    `shingles_df`: a precomputed `shingle_table` output to reuse (see its
    docstring) — otherwise the shingles are rebuilt from `df`."""
    base = shingles_df if shingles_df is not None else shingle_table(df, id_col, text_col, shingle_k)
    sh = base.select("id", F.col("__sh").alias("sh"))
    return (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash — pure Catalyst, the same aggregation shape as MinHash: explode
# tokens, md5 JVM-side, per-bit ±1 vote sums with map-side partial
# aggregation (one shuffled row per doc). Previously a pandas UDF that
# called hashlib.md5 per token per row — the last Python hot loop in the
# dedup family; this form is Python-free and whole-stage-codegen'd.
# ---------------------------------------------------------------------------

def simhash_codes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document + 4×16-bit band keys for hamming-LSH.

    The per-token hash is the first 16 hex chars of md5 (same family as
    `hash_str64`, bit-for-bit): chosen so the DuckDB oracle can replay every
    bit vote nibble-by-nibble from md5's hex output. Bit j (LSB numbering)
    of the 64-bit token hash lives in 16-bit chunk 3 - j//16 of the hex
    string, extracted with conv(); a bit's vote is +1 when set, -1 when
    clear (a null token row from an empty/NULL doc votes -1 everywhere →
    code 0, matching the previous UDF and the oracle's 2*cnt > n rule).

    Tokenizer note: splitting is Java-regex `\\s+` (ASCII whitespace),
    matching the DuckDB oracle's string_split_regex — NOT Python
    str.split()'s all-Unicode whitespace. Documents containing e.g.
    non-breaking spaces hash differently than under the retired UDF.
    """
    toks = F.filter(F.split(F.lower(F.col("__text")), r"\s+"), lambda t: t != "")
    ex = spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
    ).select("id", toks.alias("__toks")).select(
        "id", F.explode_outer("__toks").alias("__tok")
    )
    h = F.md5(F.col("__tok"))
    # chunk c = hex chars [1+4c, 4] = bits 63-16c .. 48-16c of int(hex[:16],16)
    hashed = ex.select(
        "id",
        *[F.conv(F.substring(h, 1 + 4 * c, 4), 16, 10).cast("int").alias(f"__c{c}") for c in range(4)],
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col(f"__c{3 - j // 16}"), j % 16).bitwiseAND(1) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"__v{j}")
        for j in range(64)
    ]
    agg = hashed.groupBy("id").agg(*votes)
    code = F.lit(0).cast("long")
    for j in range(64):
        code = code.bitwiseOR(
            F.when(
                F.coalesce(F.col(f"__v{j}"), F.lit(0)) > 0,
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
        )
    coded = agg.select("id", code.alias("simhash"))
    for band in range(4):
        coded = coded.withColumn(
            f"band_{band}", F.shiftrightunsigned(F.col("simhash"), band * 16).bitwiseAND(0xFFFF)
        )
    return coded


def hash_str64(s: str) -> int:
    """Deterministic 64-bit token hash: first 16 hex chars of md5 — the
    pure-Python statement of the hash family `simhash_codes` evaluates in
    Catalyst (md5 + conv), kept for tests and driver-side tooling. md5 over
    FNV so DuckDB (which has md5 but no strtol/conv-from-hex) can replay the
    exact bit pattern; md5's diffusion also beats FNV for the bit votes.
    Process-stable, unlike Python's builtin hash."""
    from hashlib import md5

    return int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big")


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, max_bucket: int = 200
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share ≥1 of 4 16-bit bands
    (pigeonhole: hamming ≤ 3 ⇒ some band identical), verified by exact
    popcount hamming distance.

    Same one-shuffle grouped-pair shape as MinHash-LSH (collect per bucket,
    expand pairs in-row, cap bucket width) — no self-join, no lineage
    recompute, no quadratic blowup on degenerate buckets.
    """
    coded = simhash_codes(df, id_col, text_col)
    exploded = coded.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[F.concat_ws(":", F.lit(b), F.col(f"band_{b}")) for b in range(4)])
        ).alias("bucket"),
    )
    grouped = exploded.groupBy("bucket").agg(
        F.collect_set(F.struct("id", "simhash")).alias("__m")
    )
    bounded = grouped.filter(F.size("__m") <= max_bucket).select(F.array_sort("__m").alias("__m"))
    pairs = bounded.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__m"),
                    lambda x, i: F.transform(
                        F.slice(F.col("__m"), i + 2, F.size(F.col("__m"))),
                        lambda y: F.struct(
                            x["id"].alias("id_a"),
                            y["id"].alias("id_b"),
                            F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.hamming").distinct()
    return pairs.filter(F.col("hamming") <= max_hamming)
