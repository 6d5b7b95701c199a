"""Tests for triangle counting (ops/graph.py), the validation suite
(ops/validate.py), and weighted sampling (llm/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aos_spark.ops import validate as V
from aos_spark.ops.graph import triangle_count


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles; an attached pendant edge adds none; duplicate
    and reversed edges must not double-count."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    noisy = k4 + [(b, a) for a, b in k4] + [(3, 9)]  # reversed dups + pendant
    out = triangle_count(_pairs(spark, noisy)).collect()[0]
    assert out["n_triangles"] == 4


def test_triangle_count_none(spark):
    out = triangle_count(_pairs(spark, [(1, 2), (3, 4), (2, 3)])).collect()[0]
    assert out["n_triangles"] == 0


def test_validation_suite_catches_planted_failures(spark):
    child = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (9, "z")], "k long, v string"
    )
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    report = {
        r["check"]: r["n_failed"]
        for r in V.run_suite(
            [
                V.check_not_null(child, "v"),
                V.check_unique(child, ["k"]),
                V.check_accepted_values(child, "v", ["x", "y", "z"]),
                V.check_referential(child, parent, "k", "k"),
            ]
        ).collect()
    }
    assert report["not_null:v"] == 1
    assert report["unique:k"] == 1  # one extra row beyond the first for k=2
    assert report["accepted_values:v"] == 1  # the NULL fails membership
    assert report["referential:k->k"] == 1  # k=9 orphaned


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """Heavy rows must be sampled at a visibly higher rate than light
    rows, deterministically (same result twice)."""
    from aos_spark.llm.sampling import weighted_sample

    df = spark.range(4_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 9.0).otherwise(1.0).alias("w"),
    )
    kept = weighted_sample(df, "w", fraction=0.2)
    heavy = kept.filter(F.col("w") == 9.0).count()
    light = kept.filter(F.col("w") == 1.0).count()
    # heavy p = min(1, .2*9/5)=.36, light p = .2*1/5=.04 → ~720 vs ~80
    assert heavy > 4 * light
    assert 500 < heavy < 940 and 20 < light < 160
    again = weighted_sample(df, "w", fraction=0.2)
    assert again.count() == kept.count()


def test_reconcile_identical_tables_all_match(spark):
    from aos_spark.ops.reconcile import diff_buckets

    df = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 17).alias("v")
    )
    out = diff_buckets(df, df, "k")
    assert out.filter(~F.col("match")).count() == 0
    assert out.agg(F.sum("n_rows_a")).first()[0] == 2_000


def test_reconcile_locates_perturbation(spark):
    """A single-row change must flip exactly its own bucket; a deleted row
    must also show a row-count mismatch in its bucket."""
    from aos_spark.ops.reconcile import diff_buckets

    df = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 17).alias("v")
    )
    changed = df.withColumn(
        "v", F.when(F.col("k") == 42, F.lit(999)).otherwise(F.col("v"))
    ).filter(F.col("k") != 1337)
    out = diff_buckets(df, changed, "k")
    bad = out.filter(~F.col("match"))
    assert 1 <= bad.count() <= 2  # change-bucket + delete-bucket (may collide)
    assert out.agg(F.sum("n_rows_b")).first()[0] == 1_999


def test_pagerank_step_cycle_is_uniform(spark):
    from aos_spark.ops.graph import pagerank_step

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    rows = {r["node"]: r for r in pagerank_step(edges).collect()}
    # every node: outdeg 1, one incoming full contribution -> rank 1.0
    assert set(rows) == {"a", "b", "c"}
    for r in rows.values():
        assert r["out_degree"] == 1 and r["in_edges"] == 1
        assert abs(r["rank"] - 1.0) < 1e-9


def test_pagerank_step_star_concentrates_rank(spark):
    from aos_spark.ops.graph import pagerank_step

    leaves = ["l1", "l2", "l3", "l4"]
    edges = spark.createDataFrame(
        [("hub", l) for l in leaves] + [(l, "hub") for l in leaves],
        ["src", "dst"],
    )
    rows = {r["node"]: r for r in pagerank_step(edges).collect()}
    # hub receives 4 full contributions: 0.15 + 0.85*4 = 3.55
    assert abs(rows["hub"]["rank"] - 3.55) < 1e-6
    # each leaf receives 1/4 of the hub: 0.15 + 0.85*0.25 = 0.3625
    for l in leaves:
        assert abs(rows[l]["rank"] - 0.3625) < 1e-6
    assert rows["hub"]["out_degree"] == 4 and rows["hub"]["in_edges"] == 4


def test_pagerank_loop_matches_python_replica(spark):
    import math
    from collections import defaultdict

    from aos_spark.ops.graph import pagerank

    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c"),
             ("d", "a"), ("a", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=8).collect()}

    def half_up(x):
        return math.floor(x + 0.5)  # Spark F.round(x, 0) for positive x

    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    r = {n: 10**12 for n in outdeg}
    base = half_up(0.15 * 10**12)
    for _ in range(8):
        inc = defaultdict(int)
        for s, d in edges:
            inc[d] += half_up(0.85 * half_up(r[s] / outdeg[s]))
        r = {n: base + inc[n] for n in outdeg}
    ref = {n: round(v / 1e12, 6) for n, v in r.items()}
    assert set(got) == set(ref)
    for n in ref:
        assert abs(got[n] - ref[n]) < 1e-9, (n, got[n], ref[n])
    # structural sanity: the well-connected hub 'a' outranks the leaf 'd'
    assert got["a"] > got["d"]


def test_pagerank_keeps_zero_in_degree_nodes(spark):
    """Review regression: node c has outdeg >= 1 but NO in-edges — it must
    keep the teleport mass (not vanish) and keep contributing to 'a' in
    every iteration, in both the single step and the loop."""
    from aos_spark.ops.graph import pagerank, pagerank_step

    edges = spark.createDataFrame(
        [("c", "a"), ("a", "b"), ("b", "a")], ["src", "dst"]
    )
    step = {r["node"]: r for r in pagerank_step(edges).collect()}
    assert set(step) == {"a", "b", "c"}
    assert step["c"]["in_edges"] == 0
    assert abs(step["c"]["rank"] - 0.15000000000000002) < 1e-12

    loop = {r["node"]: r["rank"] for r in pagerank(edges, iterations=4).collect()}
    assert set(loop) == {"a", "b", "c"}
    # c keeps exactly the teleport mass (nothing links to it); the a<->b
    # 2-cycle oscillates under power iteration, so assert mass, not order:
    # total mass obeys T = 0.45 + 0.85*T_prev from T_0 = 3 -> stays 3
    assert abs(loop["c"] - 0.15) < 1e-6
    assert min(loop["a"], loop["b"]) > loop["c"]
    assert abs(sum(loop.values()) - 3.0) < 1e-5


def test_common_neighbor_hub_cap(spark):
    """max_degree (ADVICE/VERDICT r5): a planted mega-hub must stop
    fanning out wedges once capped, and on a hub-free graph the capped
    result must be IDENTICAL to the uncapped one (the cap only drops
    hub-centered wedges, never rescores surviving pairs)."""
    from aos_spark.ops.graph import common_neighbor_scores

    # hub 0 connects to 1..20; plus a small clique 21-22-23
    edges = [(0, i) for i in range(1, 21)] + [(21, 22), (22, 23), (21, 23)]
    df = _pairs(spark, edges)

    uncapped = common_neighbor_scores(df, topk=1000).collect()
    capped = common_neighbor_scores(df, topk=1000, max_degree=5).collect()

    # uncapped: every pair (i, j) in 1..20 shares hub 0 -> C(20,2)=190
    # candidate non-edges (clique contributes none: all pairs are edges)
    assert len(uncapped) == 190
    # capped at 5: hub 0 (deg 20) is excluded as a wedge center, so no
    # hub-mediated candidates survive
    assert len(capped) == 0

    # hub-free graph: capped == uncapped bit-for-bit
    path = [(i, i + 1) for i in range(10)]
    dfp = _pairs(spark, path)
    u = sorted(map(tuple, common_neighbor_scores(dfp, topk=1000).collect()))
    c = sorted(map(tuple, common_neighbor_scores(dfp, topk=1000, max_degree=5).collect()))
    assert u == c and len(u) > 0
