"""Product-quantization tier: encode vs a pure-Python reference,
self-nearest ADC property, and codebook determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from aos_spark.llm.pq import _sq_norm, pq_codebooks, pq_encode, pq_topk


def _ref_encode(vec, books):
    """Reference argmin with the same left-fold arithmetic and
    ties-to-lowest-c rule."""
    sub_dim = len(books[0][0])
    codes = []
    for j, book in enumerate(books):
        sub = [float(x) for x in vec[j * sub_dim : (j + 1) * sub_dim]]
        best = None
        for c, cent in enumerate(book):
            dot = 0.0
            first = True
            for a, b in zip(sub, cent):
                dot = a * b if first else dot + a * b
                first = False
            d = -2.0 * dot + _sq_norm(cent)
            if best is None or (d, c) < best:
                best = (d, c)
        codes.append(best[1])
    return codes


def test_codebooks_deterministic_and_bounded():
    a = pq_codebooks(dim=16, n_sub=4, k=8, seed=9)
    assert a == pq_codebooks(dim=16, n_sub=4, k=8, seed=9)
    assert a != pq_codebooks(dim=16, n_sub=4, k=8, seed=10)
    vals = [x for book in a for cent in book for x in cent]
    assert all(-1.0 <= v < 1.0 for v in vals)


def test_pq_encode_matches_python_reference(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    rows = emb.collect()
    books = pq_codebooks()
    got = {r["vec_id"]: r for r in pq_encode(emb).collect()}
    for r in rows:
        expect = _ref_encode(r["embedding"], books)
        actual = [got[r["vec_id"]][f"code_{j}"] for j in range(8)]
        assert actual == expect, f"vec {r['vec_id']}"


def test_pq_topk_self_is_nearest(spark, sf_dir):
    """A corpus vector's own code minimizes ADC distance for itself as a
    query: each subspace's code is the per-subspace argmin, so the summed
    distance is <= any other corpus vector's."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(emb, queries, top_k=100).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        best = min(r["approx_dist"] for r in rows)
        self_rows = [r for r in rows if r["neighbor_id"] == qid]
        assert self_rows and self_rows[0]["approx_dist"] == best


def test_pq_topk_ranks_are_dense_and_bounded(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(emb, queries, top_k=10).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, 11))


def test_pq_encode_accepts_trained_codebooks(spark, sf_dir):
    """Trained (here: data-derived) codebooks plug into the same plan:
    centroids taken from actual corpus subvectors give zero quantization
    error for the donor vectors' own subspaces."""
    # filter (not limit) so the frame re-evaluates to the same 8 rows
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 8
    )
    rows = emb.collect()
    # build each subspace's codebook from the 8 donor subvectors
    books = [
        [
            [float(x) for x in r["embedding"][j * 8 : (j + 1) * 8]]
            for r in rows
        ]
        for j in range(8)
    ]
    got = {
        r["vec_id"]: r
        for r in pq_encode(emb, k=8, books=books).collect()
    }
    # donor i's nearest centroid in every subspace is its own subvector
    # (distance 0), modulo duplicate subvectors which tie to the lowest id
    for i, r in enumerate(rows):
        codes = [got[r["vec_id"]][f"code_{j}"] for j in range(8)]
        for j, c in enumerate(codes):
            assert books[j][c] == [
                float(x) for x in r["embedding"][j * 8 : (j + 1) * 8]
            ]
