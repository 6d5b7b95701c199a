"""Independent-truth checks, wave 11: the remaining sketch family
(HLL distinct + weekly merge + per-group error eval, CMS error eval,
histogram quantile sketches and their error eval, LSH band collision
stats) and the embedding transforms (int8 quantize, gram matrix,
Rademacher random projection, PQ encode, label centroids, RRF fusion).

Replication contract as in waves 1–10: register maxima and bucket
counters in plain dicts, ρ from bit_length, the Flajolet corrections in
stdlib math (the 2^-ρ sums are dyadic — exact in double in any order),
codebooks/sign matrices imported as shared PARAMETERS, every dot a
left-to-right Python fold (Spark's `aggregate` order), argmin ties on
centroid index guarded or replicated exactly.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from aos_spark.queries import QUERIES
from test_independent_truth_ml import _shingle_set


def _close(a, b, rel=1e-9, abs_=1e-9):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def _round(v: float, scale: int) -> float:
    return float(
        Decimal(repr(float(v))).quantize(
            Decimal(1).scaleb(-scale), ROUND_HALF_UP
        )
    )


def md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


@pytest.fixture(scope="module")
def vecs(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    return {
        int(v): [float(x) for x in emb]
        for v, emb in zip(e["vec_id"], e["embedding"])
    }


# ------------------------------------------------------------------ HLL


def _hll(values) -> tuple[int, float, float]:
    """(v_zero, raw_estimate, estimate) for the repo's p=6 32-bit-md5 HLL."""
    regs: dict[int, int] = {}
    for s in values:
        h = md5_32(s)
        reg, w = h >> 26, h & 67108863
        rho = 27 - w.bit_length() if w else 27
        regs[reg] = max(regs.get(reg, 0), rho)
    m = 64
    present_inv = sum(1.0 / (1 << r) for r in regs.values())
    v_zero = m - len(regs)
    raw = 0.7093409548395029 * m * m / (present_inv + float(v_zero))
    if raw <= 160.0 and v_zero > 0:
        est = m * math.log(m / v_zero)
    elif 143165576.53333333 < raw < 4294967296.0:
        est = -4294967296.0 * math.log(1.0 - raw / 4294967296.0)
    else:
        est = raw
    return v_zero, _round(raw, 6), _round(est, 6)


def test_sketch_hll_distinct(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    v_zero, raw, est = _hll(str(k) for k in li["l_orderkey"])
    got = QUERIES["sketch_hll_distinct"](spark, sf_dir).collect()[0]
    assert got["m"] == 64 and got["v_zero"] == v_zero
    _close(got["raw_estimate"], raw, rel=1e-9, abs_=1e-6)
    _close(got["estimate"], est, rel=1e-9, abs_=1e-6)


def test_sketch_hll_merge_weekly(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    weeks: dict = defaultdict(list)
    for r in ev.itertuples():
        week = (r.ts - pd.Timedelta(days=r.ts.dayofweek)).floor("D")
        weeks[week.to_pydatetime()].append(f"{r.user_id}:{r.event_type}")
    expect = {w: _hll(vals) for w, vals in weeks.items()}
    got = {
        r["week"]: (r["v_zero"], r["raw_estimate"], r["estimate"])
        for r in QUERIES["sketch_hll_merge_weekly"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for w, (vz, raw, est) in expect.items():
        assert got[w][0] == vz, w
        _close(got[w][1], raw, rel=1e-9, abs_=1e-6)
        _close(got[w][2], est, rel=1e-9, abs_=1e-6)


def test_hll_error_eval(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["o_orderstatus"]: r.asDict()
        for r in QUERIES["hll_error_eval"](spark, sf_dir).collect()
    }
    for status, g in o.groupby("o_orderstatus"):
        _vz, _raw, est = _hll(str(k) for k in g["o_custkey"])
        exact = g["o_custkey"].nunique()
        r = got[status]
        assert r["exact_distinct"] == exact, status
        _close(r["estimate"], est, rel=1e-9, abs_=1e-6)
        _close(r["rel_error"], _round((est - exact) / exact, 6), rel=1e-9,
               abs_=2e-6)
    assert set(got) == set(o["o_orderstatus"].unique())


def test_cms_error_eval(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    exact = Counter(ev["event_type"])
    sketch: Counter = Counter()
    for t, n in exact.items():
        for row in range(4):
            sketch[(row, md5_32(f"{row}:{t}") % 64)] += n
    got = {
        r["event_type"]: (r["exact_count"], r["est_count"], r["overestimate"])
        for r in QUERIES["cms_error_eval"](spark, sf_dir).collect()
    }
    expect = {}
    for t, n in exact.items():
        est = min(sketch[(row, md5_32(f"{row}:{t}") % 64)] for row in range(4))
        expect[t] = (n, est, est - n)
        assert est >= n  # CMS never undercounts
    assert got == expect


# ------------------------------------------------------ quantile sketches


def test_sketch_quantile_histogram(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    bins: Counter = Counter()
    for v in li["l_extendedprice"]:
        bins[min(max(math.floor((v - 0.0) / 468.75), 0), 255)] += 1
    total = sum(bins.values())
    cum, cum_at = 0, {}
    for b in sorted(bins):
        cum += bins[b]
        cum_at[b] = cum
    expect = {}
    for q in (0.5, 0.9, 0.99):
        b = min(b for b, c in cum_at.items() if c >= total * q)
        expect[q] = _round((b + 1) * 468.75, 6)
    got = {
        r["q"]: r["value_at_q"]
        for r in QUERIES["sketch_quantile_histogram"](spark, sf_dir).collect()
    }
    assert got == expect


def test_quantile_error_eval(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r.asDict()
        for r in QUERIES["quantile_error_eval"](spark, sf_dir).collect()
    }
    for flag, g in li.groupby("l_returnflag"):
        vals = [
            v for v, _ok, _ln in sorted(
                zip(g["l_quantity"], g["l_orderkey"], g["l_linenumber"])
            )
        ]
        n = len(vals)

        def interp(q):
            idx = q * (n - 1)
            lo = vals[math.floor(idx)]
            hi = vals[min(math.floor(idx) + 1, n - 1)]
            return lo + (idx - math.floor(idx)) * (hi - lo)

        bins: Counter = Counter()
        for v in g["l_quantity"]:
            bins[min(max(math.floor(v), 0), 63)] += 1
        cum, cum_at = 0, {}
        for b in sorted(bins):
            cum += bins[b]
            cum_at[b] = cum

        def est(q):
            return float(
                min(b for b, c in cum_at.items() if c >= n * q) + 1
            )

        r = got[flag]
        _close(r["p50"], interp(0.5), rel=1e-12, abs_=1e-12)
        _close(r["p90"], interp(0.9), rel=1e-12, abs_=1e-12)
        assert r["est_p50"] == est(0.5) and r["est_p90"] == est(0.9), flag
        _close(r["err_p50"], _round(est(0.5) - interp(0.5), 6))
        _close(r["err_p90"], _round(est(0.9) - interp(0.9), 6))


# ------------------------------------------------------------ LSH stats


def test_lsh_band_collision_stats(spark, sf_dir):
    from aos_spark.llm.dedup import MINHASH_PRIME, minhash_params

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    params = minhash_params(16)
    buckets: Counter = Counter()
    for r in docs.itertuples():
        hs = [md5_32(s) for s in _shingle_set(r.text)]
        sig = [min((h * a + b) % MINHASH_PRIME for h in hs) for a, b in params]
        for band in range(4):
            key = "|".join(str(v) for v in sig[band * 4 : (band + 1) * 4])
            buckets[(band, key)] += 1
    expect: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0])
    for (band, _key), sz in buckets.items():
        e = expect[band]
        e[0] += 1
        e[1] += 1 if sz >= 2 else 0
        e[2] += sz * (sz - 1) // 2
        e[3] = max(e[3], sz)
    got = {
        r["band"]: [r["n_buckets"], r["n_colliding"],
                    r["n_candidate_pairs"], r["max_bucket"]]
        for r in QUERIES["lsh_band_collision_stats"](spark, sf_dir).collect()
    }
    assert got == dict(expect)


# ---------------------------------------------------- embedding transforms


def test_embedding_quantize(spark, sf_dir, vecs):
    expect = {}
    for v, x in vecs.items():
        maxabs = max(abs(e) for e in x)
        scale = 127.0 / maxabs if maxabs > 0 else 0.0
        q = [max(-127, min(127, math.floor(e * scale))) for e in x]
        expect[v] = (scale, ",".join(str(i) for i in q))
    got = {
        r["vec_id"]: (r["scale"], r["q_int8"])
        for r in QUERIES["embedding_quantize"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for v, (scale, q) in expect.items():
        assert got[v][1] == q, v
        _close(got[v][0], scale, rel=1e-12, abs_=1e-12)


def test_embedding_gram_matrix(spark, sf_dir, vecs):
    acc: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for x in vecs.values():
        for i in range(8):
            for j in range(i, 8):
                acc[(i, j)][0] += 1
                acc[(i, j)][1] += math.floor(x[i] * x[j] * 1e12)
    got = {
        (r["i"], r["j"]): [r["n_vectors"], r["m2_micro"]]
        for r in QUERIES["embedding_gram_matrix"](spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in acc.items()}


def test_embedding_random_projection(spark, sf_dir, vecs):
    from aos_spark.llm.similarity import projection_signs

    signs = projection_signs(64, 8, seed=5)
    expect = {
        v: tuple(
            _round(_fold_dot(x, [float(s) for s in row]) * 0.125, 6)
            for row in signs
        )
        for v, x in vecs.items()
    }
    got = {
        r["vec_id"]: tuple(r[f"proj_{i}"] for i in range(8))
        for r in QUERIES["embedding_random_projection"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for v in expect:
        for g, e in zip(got[v], expect[v]):
            _close(g, e, rel=1e-9, abs_=1e-6)


def test_embedding_pq_encode(spark, sf_dir, vecs):
    from aos_spark.llm.pq import _sq_norm, pq_codebooks

    books = pq_codebooks()
    expect = {}
    for v, x in vecs.items():
        codes = []
        for j, book in enumerate(books):
            frag = x[j * 8 : (j + 1) * 8]
            scored = sorted(
                (-2.0 * _fold_dot(frag, cent) + _sq_norm(cent), c)
                for c, cent in enumerate(book)
            )
            # argmin margin: a tie here would make the code engine-luck
            assert scored[1][0] - scored[0][0] > 1e-12, (v, j)
            codes.append(scored[0][1])
        expect[v] = tuple(codes)
    got = {
        r["vec_id"]: tuple(r[f"code_{j}"] for j in range(8))
        for r in QUERIES["embedding_pq_encode"](spark, sf_dir).collect()
    }
    assert got == expect


def test_label_centroid_similarity(spark, sf_dir):
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mus: dict[str, list] = {}
    counts: Counter = Counter()
    for r in e.itertuples():
        x = [float(v) for v in r.embedding]
        if r.label not in mus:
            mus[r.label] = [0] * len(x)
        for d, v in enumerate(x):
            mus[r.label][d] += int(_round(v * 1e6, 0))
        counts[r.label] += 1
    cents = {
        lbl: [(s / 1e6) / counts[lbl] for s in sums]
        for lbl, sums in mus.items()
    }
    expect = {}
    labels = sorted(cents)
    for i, a in enumerate(labels):
        for b in labels[i:]:
            cos = _fold_dot(cents[a], cents[b]) / (
                math.sqrt(_fold_dot(cents[a], cents[a]))
                * math.sqrt(_fold_dot(cents[b], cents[b]))
            )
            expect[(a, b)] = _round(cos, 6)
    got = {
        (r["label_a"], r["label_b"]): r["cosine"]
        for r in QUERIES["label_centroid_similarity"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        _close(got[k], expect[k], rel=1e-9, abs_=2e-6)


def test_rrf_fusion_topk(spark, sf_dir, vecs):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    norms = {v: math.sqrt(_fold_dot(x, x)) for v, x in vecs.items()}
    queries = [v for v in sorted(vecs) if v < 5]
    sem_rank: dict[tuple, int] = {}
    for qv in queries:
        scored = sorted(
            (
                (-_fold_dot(vecs[qv], vecs[d]) / (norms[qv] * norms[d]), d)
                for d in vecs if d != qv
            )
        )
        for rank, (_negc, d) in enumerate(scored[:50], 1):
            sem_rank[(qv, d)] = rank
    toks = {}
    for r in docs.itertuples():
        t = re.sub(r"[^a-z0-9]+", " ", (r.text or "").lower()).strip()
        toks[r.doc_id] = set(t.split(" ")) if t else {""}
    lex_rank: dict[tuple, int] = {}
    for qv in queries:
        scored = sorted(
            (
                (-len(toks[qv] & toks[d]), d)
                for d in toks if d != qv and toks[qv] & toks[d]
            )
        )
        for rank, (_nov, d) in enumerate(scored[:50], 1):
            lex_rank[(qv, d)] = rank
    fused: dict[int, list] = defaultdict(list)
    for qv in queries:
        cand = {d for (q, d) in sem_rank if q == qv} | {
            d for (q, d) in lex_rank if q == qv
        }
        rows = []
        for d in cand:
            sm = 1_000_000_000 // (60 + sem_rank[(qv, d)]) if (qv, d) in sem_rank else 0
            lm = 1_000_000_000 // (60 + lex_rank[(qv, d)]) if (qv, d) in lex_rank else 0
            rows.append((-(sm + lm), d, sm, lm))
        rows.sort()
        for rank, (neg, d, sm, lm) in enumerate(rows[:10], 1):
            fused[qv].append((rank, d, -neg, sm, lm))
    expect = {
        (qv, rank): (d, rrf, sm, lm)
        for qv, rows in fused.items()
        for rank, d, rrf, sm, lm in rows
    }
    got = {
        (r["query_id"], r["fused_rank"]):
            (r["doc_id"], r["rrf_micros"], r["sem_micros"], r["lex_micros"])
        for r in QUERIES["rrf_fusion_topk"](spark, sf_dir).collect()
    }
    assert got == expect and expect
