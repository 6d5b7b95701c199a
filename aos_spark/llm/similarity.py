"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (query side broadcast, one
pass over the corpus — linear scan, no shuffle of the corpus). The scale
path is LSH bucketing by deterministic random-hyperplane signs: corpus is
pre-bucketed once (a write-time transform at 100 TB), queries probe only
their bucket(s).

Cosine is a pure Catalyst expression (zip_with + aggregate over the array
column) — JVM-side, no Python in the hot loop.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a, b) -> Column:
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ac, bc, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a, b) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_from_norms(a, b, norm_a, norm_b) -> Column:
    """Cosine with PRE-MATERIALIZED norm columns: dot/(na*nb) — identical
    IEEE754 arithmetic to cosine_expr, but the O(dim) norm aggregation runs
    once per vector instead of once per pair."""
    na = F.col(norm_a) if isinstance(norm_a, str) else norm_a
    nb = F.col(norm_b) if isinstance(norm_b, str) else norm_b
    return dot_expr(a, b) / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan shape: broadcast(queries) × corpus → cosine → per-query top-k via
    window. The corpus never shuffles; only (|Q|·k) rows survive to the
    final exchange. Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(F.col(vec_col)).alias("__qn"),
    )
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(F.col(vec_col)).alias("__cn"),
    ).join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn(
        "cosine", cosine_from_norms("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure stdlib, seeded)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_bucket(
    vec_col: str, n_planes: int = 8, seed: int = 7, dim: int = 64
) -> Column:
    """LSH bucket id = integer of sign bits of <v, h_i> for fixed seeded
    hyperplanes — a deterministic Catalyst expression (the planes are
    literals folded into the plan; no UDF, no nondeterminism)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane_arr = F.array(*[F.lit(x) for x in p])
        d = dot_expr(F.col(vec_col), plane_arr)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 6,
    seed: int = 7,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket.

    At 100 TB the corpus is written pre-bucketed (bucket as a partition
    column) so a probe is a partition-pruned scan; here the bucket column
    is computed inline. Recall is tunable via n_planes (fewer planes →
    bigger buckets → higher recall, more compute).
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm_expr(F.col(vec_col)).alias("__cn"),
        hyperplane_bucket(vec_col, n_planes, seed, dim).alias("bucket"),
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm_expr(F.col(vec_col)).alias("__qn"),
        hyperplane_bucket(vec_col, n_planes, seed, dim).alias("bucket"),
    )
    scored = cb.join(F.broadcast(qb), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.withColumn(
        "cosine", cosine_from_norms("__qv", "__cv", "__qn", "__cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
