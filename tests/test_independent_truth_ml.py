"""Independent-truth checks, ML tier: pure-Python/numpy replicas of the
similarity-retrieval, sketch, MinHash-LSH, and BPE/PII/winnowing text
queries (VERDICT r10 "Next round" #1 — these families previously had only
oracle+pytest evidence, sharing an author blind spot with the SQL).

Replication contract (same as tests/test_independent_truth.py): shared
PARAMETERS are imported from the engine (hash seeds, hyperplanes, affine
minhash params, PQ codebooks — they are part of the query's definition,
like a column name), but every ALGORITHM is recomputed from first
principles here — numpy matrix products instead of Catalyst aggregate
folds, Python dict/set/Counter passes instead of shuffles and windows,
hashlib.md5 instead of F.md5 — so a semantic bug present in both the
Spark plan and its DuckDB oracle cannot also be present here.

Float comparisons use the established isclose(rel 1e-6, abs 2e-6) band;
integer/rational outputs (counts, round_ratio6 values) compare EXACTLY.
Ranking replicas guard their tie margins explicitly: where a top-k set
could legitimately differ across engines (a cosine knife-edge at the k
boundary, an IVF assignment margin), the test asserts the margin is wide
enough that exact set equality is implied — so a failure is always a
semantic divergence, never float noise.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

from aos_spark.queries import QUERIES

DIM = 64


def _close(a, b, rel=1e-6, abs_=2e-6):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def round_ratio6(num: int, den: int) -> float:
    """Python replica of ops/exact_round.round_ratio6: engine-exact
    ROUND(num/den, 6) as integer floor((num·2e6 + den) / (2·den)) / 1e6."""
    return ((num * 2_000_000 + den) // (2 * den)) / 1e6


def md5_32(s: str) -> int:
    """First 8 md5 hex chars as an int — the repo's cross-engine hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(sf_dir):
    """(ids, matrix float64, row-normalized matrix, id->row index)."""
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    ids = e["vec_id"].to_numpy()
    m = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m, mn, {v: i for i, v in enumerate(ids)}


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _shingle_set(text: str, n: int = 3) -> frozenset[str]:
    """Replica of llm/dedup.shingle_frame: distinct word n-grams; docs
    shorter than n tokens contribute the single joined-token shingle."""
    toks = _tokens(text)
    if len(toks) >= n:
        return frozenset(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
    return frozenset([" ".join(toks)])


@pytest.fixture(scope="module")
def py_shingles(docs):
    return {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}


# ---------------------------------------------------------------------------
# MinHash + LSH banding


def _minhash_banded_candidates(shingles: dict, num_hashes=16, bands=4):
    """Dict/set replica of banded_minhash_frame + _banded_candidates:
    signature from the shared affine params over md5 shingle hashes, band
    keys as joined signature slices, candidate pairs = bucket-mates."""
    from aos_spark.llm.dedup import MINHASH_PRIME, minhash_params

    params = minhash_params(num_hashes)
    rows = num_hashes // bands
    buckets: dict = {}
    for doc_id, sh in shingles.items():
        hs = [md5_32(s) for s in sh]
        sig = [min((h * a + b) % MINHASH_PRIME for h in hs) for a, b in params]
        for bi in range(bands):
            key = (bi, "|".join(str(v) for v in sig[bi * rows : (bi + 1) * rows]))
            buckets.setdefault(key, []).append(doc_id)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                if a != b:
                    cand.add((a, b))
    return cand


def test_dedup_minhash_lsh_matches_set_replica(spark, sf_dir, py_shingles):
    """Banded candidates recomputed with Python dicts, verification with
    Python set intersection/union (vs Spark's array_intersect/array_union
    over a banded sort-merge self-join) — jaccard values compare EXACTLY
    (both sides are the same integer rational rounding)."""
    cand = _minhash_banded_candidates(py_shingles)
    expect = {}
    for a, b in cand:
        sa, sb = py_shingles[a], py_shingles[b]
        inter = len(sa & sb)
        jac = round_ratio6(inter, len(sa) + len(sb) - inter)
        if jac >= 0.3:
            expect[(a, b)] = jac
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "degenerate fixture: no near-dup pairs to verify"


def test_lsh_recall_eval_matches_python(spark, sf_dir, py_shingles):
    """The banding-quality eval end-to-end: md5-deterministic sample,
    O(n²) Python ground truth, banded candidates, exact integer counts
    and rational recall/precision. The sample is the registry's r12
    absolute cap: first 1000 docs in (md5('lsh_eval'||id), id) order —
    recomputed here with hashlib, independently of the engine."""
    ordered = sorted(
        py_shingles,
        key=lambda d: (
            hashlib.md5(("lsh_eval" + str(d)).encode()).hexdigest(),
            d,
        ),
    )
    sample = {d: py_shingles[d] for d in ordered[:1000]}
    truth = set()
    ids = sorted(sample)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sample[a], sample[b]
            inter = len(sa & sb)
            if round_ratio6(inter, len(sa) + len(sb) - inter) >= 0.3:
                truth.add((a, b))
    cand = _minhash_banded_candidates(sample)
    hits = truth & cand
    row = QUERIES["lsh_recall_eval"](spark, sf_dir).collect()[0]
    assert row["n_sample_docs"] == len(sample)
    assert row["n_true_pairs"] == len(truth)
    assert row["n_candidate_pairs"] == len(cand)
    assert row["n_hit_pairs"] == len(hits)
    assert row["recall"] == (
        round_ratio6(len(hits), len(truth)) if truth else 1.0
    )
    assert row["precision"] == (
        round_ratio6(len(hits), len(cand)) if cand else 1.0
    )


# ---------------------------------------------------------------------------
# Sketches: count-min and HyperLogLog, end-to-end pure-Python


def test_cms_estimate_matches_pure_python(spark, sf_dir):
    """A from-scratch Counter-based count-min sketch with the shared
    md5 bucket hash (depth 4, width 64): counters, minima, and the
    never-undercounts property all recomputed without Spark."""
    from collections import Counter

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    keys = ev["event_type"].tolist()
    depth, width = 4, 64
    counters: Counter = Counter()
    for key in keys:
        for g in range(depth):
            counters[(g, md5_32(f"{g}:{key}") % width)] += 1
    truth = Counter(keys)
    expect = {
        k: min(counters.get((g, md5_32(f"{g}:{k}") % width), 0) for g in range(depth))
        for k in set(keys)
    }
    got = {
        r["event_type"]: r["est_count"]
        for r in QUERIES["sketch_cms_estimate"](spark, sf_dir).collect()
    }
    assert got == expect
    for k, est in got.items():  # CMS estimates never undercount
        assert est >= truth[k], (k, est, truth[k])


def test_hll_grouped_matches_pure_python(spark, sf_dir):
    """A from-scratch HyperLogLog (p=6, 32-bit md5 hash): register maxima
    via a Python dict, the Flajolet correction ladder in plain floats,
    plus the author-independent sanity bound that the estimate lands
    within 3 standard errors (1.04/√m ≈ 13%) of the true cardinality."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    p, hash_bits = 6, 32
    m, q = 1 << p, hash_bits - p
    alpha = 0.7213 / (1 + 1.079 / m)
    two32 = float(1 << 32)
    got = {
        r["o_orderstatus"]: r
        for r in QUERIES["sketch_hll_grouped"](spark, sf_dir).collect()
    }
    assert set(got) == set(o["o_orderstatus"].unique())
    for status, g in o.groupby("o_orderstatus"):
        regs: dict[int, int] = {}
        for key in g["o_custkey"]:
            h = md5_32(str(key))
            reg, w = h >> q, h & ((1 << q) - 1)
            rho = (q - w.bit_length() + 1) if w else q + 1
            regs[reg] = max(regs.get(reg, 0), rho)
        n_present = len(regs)
        sum_inv = sum(1.0 / (1 << r) for r in regs.values()) + float(m - n_present)
        raw = alpha * m * m / sum_inv if n_present else 0.0
        if raw <= 2.5 * m and n_present < m:
            est = float(m) * math.log(m / float(m - n_present)) if n_present else 0.0
        elif two32 / 30.0 < raw < two32:
            est = -two32 * math.log(1.0 - raw / two32)
        else:
            est = raw
        r = got[status]
        assert r["m"] == m and r["v_zero"] == m - n_present
        _close(r["raw_estimate"], raw, rel=1e-9)
        _close(r["estimate"], est, rel=1e-9)
        true_n = g["o_custkey"].nunique()
        assert abs(est - true_n) / true_n < 3 * 1.04 / math.sqrt(m), (
            status, est, true_n,
        )


# ---------------------------------------------------------------------------
# Similarity retrieval: LSH / IVF probes and the recall evals


def _assert_margin(sorted_desc: np.ndarray, k: int, what: str):
    """Rank boundaries must be decisive: if the k-th and (k+1)-th scores
    sit within float-noise of each other, exact set equality across
    engines is not implied and the fixture (not the engine) is at fault."""
    if len(sorted_desc) > k:
        assert sorted_desc[k - 1] - sorted_desc[k] > 1e-9, (
            f"{what}: tie at the top-{k} boundary — fixture not decisive"
        )


def _topk_ids(ids, cos: np.ndarray, k: int):
    order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:k]
    return [ids[i] for i in order], [cos[i] for i in order]


def _spark_topk(spark, sf_dir, name):
    by_q: dict = {}
    for r in QUERIES[name](spark, sf_dir).collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
    return by_q


def test_sim_lsh_topk_matches_numpy(spark, sf_dir, emb):
    """Hyperplane-LSH probe replicated in numpy: sign-bit buckets from
    the shared planes, candidate set = the query's bucket, exact cosine
    ranking. Bucket sign margins are asserted non-degenerate, so the
    candidate sets (and hence the top-10) must match exactly."""
    from aos_spark.llm.similarity import _hyperplanes

    ids, m, mn, idx = emb
    planes = np.array(_hyperplanes(DIM, 6, 7))
    dots = m @ planes.T
    assert np.abs(dots).min() > 1e-9, "degenerate: a sign bit is a coin flip"
    bucket = ((dots >= 0) * (1 << np.arange(6))).sum(axis=1)
    got = _spark_topk(spark, sf_dir, "sim_lsh_topk")
    assert sorted(got) == [int(i) for i in ids if i < 5]
    for qid, rows in got.items():
        qi = idx[qid]
        cand = [i for i in range(len(ids)) if bucket[i] == bucket[qi] and i != qi]
        cos = mn[cand] @ mn[qi]
        exp_ids, exp_cos = _topk_ids([ids[i] for i in cand], cos, 10)
        _assert_margin(np.sort(cos)[::-1], min(10, len(cand)), f"lsh q{qid}")
        assert [r["neighbor_id"] for r in rows] == exp_ids
        for r, c in zip(rows, exp_cos):
            _close(r["cosine"], float(c))


def _ivf_replica(ids, mn, idx, n_centroids=8, nprobe=2, k=10):
    """IVF-flat replica: centroids = lowest-id vectors, nearest-centroid
    assignment and probe selection by cosine with id tie-break, exact
    scoring within probed cells. Returns per-query top-k id lists and the
    assignment margins (for degeneracy guards)."""
    cent_rows = [idx[i] for i in sorted(ids)[:n_centroids]]
    sim = mn @ mn[cent_rows].T  # (N, n_centroids)
    order = np.argsort(-sim, axis=1, kind="stable")  # ties -> lowest cid
    assign = order[:, 0]
    margins = sim[np.arange(len(ids)), order[:, 0]] - sim[
        np.arange(len(ids)), order[:, 1]
    ]
    out = {}
    for qid in [int(i) for i in ids if i < 5]:
        qi = idx[qid]
        probes = set(order[qi, :nprobe])
        cand = [
            i for i in range(len(ids)) if assign[i] in probes and ids[i] != qid
        ]
        cos = mn[cand] @ mn[qi]
        exp_ids, exp_cos = _topk_ids([ids[i] for i in cand], cos, k)
        out[qid] = (exp_ids, exp_cos, np.sort(cos)[::-1], len(cand))
    return out, margins


def test_sim_ivf_topk_matches_numpy(spark, sf_dir, emb):
    ids, m, mn, idx = emb
    replica, margins = _ivf_replica(ids, mn, idx)
    assert margins.min() > 1e-9, "degenerate: an IVF assignment is a tie"
    got = _spark_topk(spark, sf_dir, "sim_ivf_topk")
    assert sorted(got) == sorted(replica)
    for qid, rows in got.items():
        exp_ids, exp_cos, sorted_cos, n_cand = replica[qid]
        _assert_margin(sorted_cos, min(10, n_cand), f"ivf q{qid}")
        assert [r["neighbor_id"] for r in rows] == exp_ids
        for r, c in zip(rows, exp_cos):
            _close(r["cosine"], float(c))


def _exact_topk_sets(ids, mn, idx, k=10):
    """Exact-NN ground truth per query from the full-dim matrix."""
    out = {}
    for qid in [int(i) for i in ids if i < 5]:
        qi = idx[qid]
        cos = mn @ mn[qi]
        cos[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))
        _assert_margin(np.sort(cos)[::-1], k, f"truth q{qid}")
        out[qid] = {ids[i] for i in order[:k]}
    return out


def test_ann_recall_eval_matches_numpy(spark, sf_dir, emb):
    """recall@10 of the IVF probe recomputed against a numpy exact-NN
    ground truth — integer hit counts and the rational recall compare
    EXACTLY (margins guarded on both rankings)."""
    ids, m, mn, idx = emb
    truth = _exact_topk_sets(ids, mn, idx)
    replica, margins = _ivf_replica(ids, mn, idx)
    assert margins.min() > 1e-9
    got = {
        r["query_id"]: r
        for r in QUERIES["ann_recall_eval"](spark, sf_dir).collect()
    }
    assert sorted(got) == sorted(truth)
    for qid, r in got.items():
        hits = len(truth[qid] & set(replica[qid][0]))
        assert r["n_truth"] == 10 and r["n_hits"] == hits
        assert r["recall_at_k"] == round_ratio6(hits, 10)


def test_matryoshka_recall_eval_matches_numpy(spark, sf_dir, emb):
    """Truncation eval: top-10 under the first 16 dims vs the full-dim
    exact ground truth, both recomputed in numpy."""
    ids, m, mn, idx = emb
    truth = _exact_topk_sets(ids, mn, idx)
    t = m[:, :16]
    tn = t / np.linalg.norm(t, axis=1, keepdims=True)
    got = {
        r["query_id"]: r
        for r in QUERIES["matryoshka_recall_eval"](spark, sf_dir).collect()
    }
    assert sorted(got) == sorted(truth)
    for qid, r in got.items():
        qi = idx[qid]
        cos = tn @ tn[qi]
        cos[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))
        _assert_margin(np.sort(cos)[::-1], 10, f"mrl q{qid}")
        approx = {ids[i] for i in order[:10]}
        hits = len(truth[qid] & approx)
        assert r["n_truth"] == 10 and r["n_hits"] == hits
        assert r["recall_at_k"] == round_ratio6(hits, 10)


# ---------------------------------------------------------------------------
# Product quantization: encode + ADC, replicated in numpy/Decimal


def _pq_replica(ids, m, idx, candidates=None, k=10):
    """PQ ADC replica: shared deterministic codebooks, numpy argmin
    encode (ties guarded), per-fragment Decimal(28,12) quantization and
    exact fragment summation mirroring the documented arithmetic. When
    ``candidates`` is None every (query, corpus) pair scores — including
    the query itself, as pq_topk documents."""
    from decimal import ROUND_HALF_UP, Decimal

    from aos_spark.llm.pq import pq_codebooks

    books = np.array(pq_codebooks())  # (n_sub=8, k=16, sub_dim=8)
    n_sub, nk, sub_dim = books.shape
    subs = m.reshape(len(m), n_sub, sub_dim)
    # encode: argmin_c -2<s,c> + ||c||², ties -> lowest c (argmin is first)
    cc = (books**2).sum(axis=2)  # (n_sub, k)
    d = -2.0 * np.einsum("njd,jcd->njc", subs, books) + cc[None, :, :]
    codes = d.argmin(axis=2)
    dd = np.sort(d, axis=2)
    assert (dd[:, :, 1] - dd[:, :, 0]).min() > 1e-9, "PQ encode tie"

    q12 = Decimal("1e-12")
    out = {}
    for qid in [int(i) for i in ids if i < 5]:
        qi = idx[qid]
        frag = {}
        for j in range(n_sub):
            s = subs[qi, j]
            qq = float(s @ s)
            for c in range(nk):
                val = (qq - 2.0 * float(s @ books[j, c])) + float(cc[j, c])
                frag[(j, c)] = Decimal(repr(val)).quantize(q12, ROUND_HALF_UP)
        scored = []
        for i in range(len(ids)):
            if candidates is not None and (qid, ids[i]) not in candidates:
                continue
            dist = sum(frag[(j, codes[i, j])] for j in range(n_sub))
            scored.append((float(round(dist, 6)), ids[i]))
        scored.sort()
        out[qid] = scored[:k]
    return out


def test_sim_pq_topk_matches_replica(spark, sf_dir, emb):
    ids, m, mn, idx = emb
    replica = _pq_replica(ids, m, idx)
    got = _spark_topk(spark, sf_dir, "sim_pq_topk")
    assert sorted(got) == sorted(replica)
    for qid, rows in got.items():
        exp = replica[qid]
        assert [r["neighbor_id"] for r in rows] == [nid for _, nid in exp]
        for r, (dist, _) in zip(rows, exp):
            _close(r["approx_dist"], dist)


def test_sim_ivfpq_topk_matches_replica(spark, sf_dir, emb):
    """IVF coarse pruning composed with PQ ADC: the candidate pairs come
    from the IVF replica's probe cells (self excluded), scoring and
    ranking from the PQ replica."""
    ids, m, mn, idx = emb
    cent_rows = [idx[i] for i in sorted(ids)[:8]]
    sim = mn @ mn[cent_rows].T
    order = np.argsort(-sim, axis=1, kind="stable")
    assign = order[:, 0]
    margins = sim[np.arange(len(ids)), order[:, 0]] - sim[
        np.arange(len(ids)), order[:, 1]
    ]
    assert margins.min() > 1e-9
    candidates = set()
    for qid in [int(i) for i in ids if i < 5]:
        probes = set(order[idx[qid], :2])
        for i in range(len(ids)):
            if assign[i] in probes and ids[i] != qid:
                candidates.add((qid, int(ids[i])))
    replica = _pq_replica(ids, m, idx, candidates=candidates)
    got = _spark_topk(spark, sf_dir, "sim_ivfpq_topk")
    assert sorted(got) == sorted(replica)
    for qid, rows in got.items():
        exp = replica[qid]
        assert [r["neighbor_id"] for r in rows] == [nid for _, nid in exp]
        for r, (dist, _) in zip(rows, exp):
            _close(r["approx_dist"], dist)


# ---------------------------------------------------------------------------
# Text chain: BPE-ish counts, PII scrub, winnowing fingerprints


def test_bpe_tokens_matches_re(spark, sf_dir, docs):
    """Both token counters replicated with Python re on the raw text —
    exact integer equality for every document."""
    from aos_spark.llm.text import BPE_ISH_PATTERN

    pat = re.compile(BPE_ISH_PATTERN)
    got = {
        r["doc_id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in QUERIES["text_bpe_tokens"](spark, sf_dir).collect()
    }
    assert len(got) == len(docs)
    for r in docs.itertuples():
        ws = len(r.text.split()) if r.text and r.text.strip() else 0
        bpe = len(pat.findall(r.text or ""))
        assert got[r.doc_id] == (ws, bpe), (r.doc_id, got[r.doc_id], (ws, bpe))


def test_pii_scrub_matches_re(spark, sf_dir, docs):
    """PII counts and the md5 fingerprint of the fully redacted text
    recomputed with Python re (ASCII mode, matching Java regex classes)
    over an independently re-built seeded text — one mis-replaced
    character anywhere diverges the fingerprint."""
    from aos_spark.llm.text import PII_PATTERNS

    pats = {k: re.compile(p, re.ASCII) for k, p in PII_PATTERNS.items()}
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["text_pii_scrub"](spark, sf_dir).collect()
    }
    assert len(got) == len(docs)
    for r in docs.itertuples():
        d = int(r.doc_id)
        seeded = (
            f"user{d}@example.com call 555-{d % 1000:03d}-{d % 10000:04d}"
            f" ip 10.0.{d % 256}.7 ssn 123-45-6789 {r.text}"
        )
        row = got[d]
        for kind, cre in pats.items():
            assert row[f"n_{kind}"] == len(cre.findall(seeded)), (d, kind)
        redacted = seeded
        for kind, cre in pats.items():
            redacted = cre.sub(f"<{kind.upper()}>", redacted)
        fp = hashlib.md5(redacted.encode()).hexdigest()[:16]
        assert row["redacted_fp"] == fp, d


def test_winnowing_matches_python(spark, sf_dir, docs):
    """MOSS winnowing (k=4, w=4) replicated with a Python sliding-window
    min over (hash·2³¹ + pos) keys — n_grams, the selected-fingerprint
    count, and the rational density all compare exactly."""
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["winnowing_fingerprints"](spark, sf_dir).collect()
    }
    k, w = 4, 4
    n_checked = 0
    for r in docs.itertuples():
        toks = _tokens(r.text)
        grams = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ] if len(toks) >= k else []
        if not grams:
            assert r.doc_id not in got  # gramless docs are excluded
            continue
        keys = [md5_32(g) * (1 << 31) + p for p, g in enumerate(grams)]
        selected = {
            min(keys[p : p + w])
            for p in range(max(len(grams) - w, 0) + 1)
        }
        row = got[r.doc_id]
        assert row["n_grams"] == len(grams)
        assert row["n_selected"] == len(selected)
        assert row["density"] == round_ratio6(len(selected), len(grams))
        n_checked += 1
    assert n_checked == len(got)
