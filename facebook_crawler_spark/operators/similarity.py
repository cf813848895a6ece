"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, broadcast the (small) query set,
score with built-in higher-order functions (zip_with + aggregate, JVM-side,
no Python), rank per query. Scale path: signed-random-projection LSH
bucketing so only same-bucket pairs are scored (sub-linear candidate set);
an IVF-style coarse quantizer is the same plan with learned centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from facebook_crawler_spark.operators.partitioning import spread


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of `corpus` per query row.

    The query side is broadcast (ANN queries are ≪ corpus); scoring is a
    broadcast nested-loop with JVM-side arithmetic — the right baseline
    plan, linear in |corpus|, no shuffle of the corpus. Ties break by
    corpus id for determinism.
    """
    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec")))
    # corpus-side scoring is map-side compute (broadcast join, no corpus
    # exchange) — spread so an underpartitioned scan uses every core
    scored = spread(corpus).crossJoin(q).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), _as_double(F.col("__qvec"))), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def _as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: sign bit per hyperplane."""
    bits = [
        F.when(dot(_as_double(vec), F.array(*[F.lit(p) for p in plane])) >= 0, 1 << i).otherwise(0)
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes (numpy PCG64(seed)) — broadcast as literals."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's SRP bucket.

    With 8 planes, buckets hold ~1/256 of the corpus — the scored candidate
    set shrinks 100-1000x vs brute force; recall is probabilistic (same
    trade a production IVF/HNSW makes). Bucketing is pure Catalyst
    expressions, so the corpus-side bucket id is computed in one codegen'd
    projection and can be persisted/bucketed for reuse across query batches.
    """
    planes = make_planes(dim, n_planes)
    c = spread(corpus).withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
        ).withColumn("__bucket", srp_bucket(F.col("__qvec"), planes))
    )
    scored = c.join(q, "__bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), _as_double(F.col("__qvec"))), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def kmeans_lite_centroids(
    corpus: DataFrame, k: int = 16, vec_col: str = "embedding", iters: int = 3, seed: int = 42
) -> list[list[float]]:
    """Deterministic coarse quantizer for IVF: k centroids via a few Lloyd
    iterations over a bounded sample (no MLlib dependency). The sample is
    the 4000 rows with the smallest xxhash64(vector) — deterministic and
    decorrelated from storage order (a bare limit() is a prefix scan: on a
    corpus whose partition order tracks cluster structure, e.g. sorted or
    time-ordered embeddings, it misses whole regions). orderBy+limit plans
    as TakeOrderedAndProject (per-partition top-k, no full sort), and a
    fraction-based sample would first cost a full count() scan. The result
    is a driver-side list broadcast into the assignment expression."""
    import numpy as np

    sample = (
        corpus.select(_as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64("v"))
        .limit(4000)
    )
    pts = np.array([r.v for r in sample.collect()])
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = pts[rng.choice(len(pts), size=min(k, len(pts)), replace=False)]
    for _ in range(iters):
        d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = pts[mask].mean(axis=0)
    return cents.tolist()


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2), as a Catalyst expression."""
    d2s = [
        F.aggregate(
            F.zip_with(_as_double(vec), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in centroids
    ]
    best = F.least(*d2s)
    out = F.lit(-1)
    for i in reversed(range(len(d2s))):
        out = F.when(d2s[i] == best, F.lit(i)).otherwise(out)
    return out


def _probe_cells(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """array<int> of the `n_probe` nearest centroid indexes — pure Catalyst:
    per-centroid squared-L2 exprs, array_sort of (d2, idx) structs (sorts by
    d2 then idx, the deterministic tiebreak), slice, project idx."""
    d2s = [
        F.aggregate(
            F.zip_with(_as_double(vec), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in centroids
    ]
    ranked = F.array_sort(
        F.array(*[F.struct(d.alias("d2"), F.lit(i).alias("idx")) for i, d in enumerate(d2s)])
    )
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s["idx"])


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into inverted lists, score
    a query only against its `n_probe` nearest lists.

    Plan shape mirrors a production IVF index: the corpus-side cell id is
    one codegen'd projection (persistable/bucketable for reuse), the query
    side computes its probe cells with the SAME Catalyst expressions (no
    driver-side collect — an arbitrarily large query batch stays
    distributed), explodes them, and is broadcast into the corpus join,
    which hits ~n_probe/n_centroids of the corpus.

    `centroids`: pass a fixed list to make the whole plan a deterministic
    pure function of its inputs (SQL-oracle-checkable); default trains the
    kmeans-lite coarse quantizer.
    """
    if centroids is None:
        centroids = kmeans_lite_centroids(corpus, k=n_centroids, vec_col=vec_col)
    c = spread(corpus).withColumn("__cell", _nearest_centroid(F.col(vec_col), centroids))

    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            F.explode(_probe_cells(F.col(vec_col), centroids, n_probe)).alias("__cell"),
        )
    )

    scored = c.join(q, "__cell").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(_as_double(F.col(vec_col)), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    dim: int = 16,
    bands: int = 2,
    max_bucket: int = 200,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-band SRP bucketing.

    `bands` independent SRP plane sets (OR-amplification: a pair is a
    candidate if it shares the full bucket in ANY band — recall grows with
    bands while each band's bucket stays selective). Pair expansion is the
    same capped in-row form as MinHash-LSH (`dedup._pairs_within_buckets`):
    one shuffle on the band key, ≤ max_bucket²/2 pairs per bucket, and a
    degenerate bucket (many identical/zero vectors) is DROPPED rather than
    going quadratic — the guardrail the previous self-join formulation
    lacked. Exact cosine is then computed only for surviving candidate
    pairs by joining the vectors back.
    """
    from facebook_crawler_spark.operators.dedup import _pairs_within_buckets

    keyed = spread(corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")))
    band_keys = [
        F.concat(
            F.lit(f"{b}:"),
            srp_bucket(F.col("vec"), make_planes(dim, n_planes, seed=seed + b)).cast("string"),
        )
        for b in range(bands)
    ]
    exploded = keyed.select("id", F.explode(F.array(*band_keys)).alias("band"))
    pairs = _pairs_within_buckets(exploded, "band", max_bucket=max_bucket)
    va = keyed.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    vb = keyed.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(_as_double(F.col("va")), _as_double(F.col("vb"))), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
