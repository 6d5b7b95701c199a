"""Independent-truth checks, wave 9: the dedup tier end-to-end — exact
hash dedup, storage savings, the threshold curve, containment,
span-level dedup, the cross-source duplication matrix, both
decontamination checks, winnowing source overlap, incremental admission
status, semantic (embedding) dedup, hyperplane-bucketed cosine pairs,
source-level MinHash sketches, and cluster resolution.

Replication contract as in waves 1–8: shingle sets and MinHash
PARAMETERS come from the shared definitions (`_shingle_set`,
`minhash_params` — they define the queries, like a column name); every
candidate join is replaced by an inverted-index or dict pass, every
connected component by a from-scratch union-find, every cosine by a
left-to-right Python fold (matching Spark's `aggregate` lambda order,
where numpy's pairwise summation could differ in the last ulp).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from aos_spark.queries import QUERIES
from test_independent_truth_ml import _minhash_banded_candidates, _shingle_set
from test_independent_truth_text import _quality, filt_tokens


def round_ratio6(num: int, den: int) -> float:
    return ((num * 2_000_000 + den) // (den * 2)) / 1e6


def md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def shingles(docs):
    return {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}


@pytest.fixture(scope="module")
def jaccard_pairs_03(shingles):
    """All pairs with rounded 3-gram Jaccard >= 0.3 via an inverted
    shingle index (no banding, no SQL self-join)."""
    posting: dict[str, list] = defaultdict(list)
    for doc_id in sorted(shingles):
        for sh in shingles[doc_id]:
            posting[sh].append(doc_id)
    common: Counter = Counter()
    for ids in posting.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                common[(ids[i], ids[j])] += 1
    pairs = {}
    for (a, b), inter in common.items():
        union = len(shingles[a]) + len(shingles[b]) - inter
        jac = round_ratio6(inter, union)
        if jac >= 0.3:
            pairs[(a, b)] = jac
    return pairs


def _split_bucket(doc_id: int) -> int:
    return md5_32("split" + str(doc_id)) % 100


def test_dedup_exact(spark, sf_dir, docs):
    groups: dict[str, list] = defaultdict(list)
    for r in docs.itertuples():
        norm = re.sub(r"[^a-z0-9]+", " ", (r.text or "").lower()).strip()
        groups[hashlib.md5(norm.encode()).hexdigest()].append(r.doc_id)
    expect = {h: (min(ids), len(ids)) for h, ids in groups.items()}
    got = {
        r["content_hash"]: (r["keeper_id"], r["n_copies"])
        for r in QUERIES["dedup_exact"](spark, sf_dir).collect()
    }
    assert got == expect


def test_dedup_storage_savings(spark, sf_dir, docs):
    g: dict[tuple, list] = defaultdict(lambda: [0, None])
    for r in docs.itertuples():
        key = (r.lang, hashlib.md5((r.text or "").encode()).hexdigest())
        g[key][0] += 1
        g[key][1] = r.n_chars if g[key][1] is None else min(g[key][1], r.n_chars)
    expect: dict[str, list] = defaultdict(lambda: [0, 0, 0, 0])
    for (lang, _h), (n, chars) in g.items():
        e = expect[lang]
        e[0] += n
        e[1] += 1
        e[2] += n * chars
        e[3] += (n - 1) * chars
    got = {
        r["lang"]: [r["n_docs"], r["n_unique"], r["chars_total"], r["chars_removed"]]
        for r in QUERIES["dedup_storage_savings"](spark, sf_dir).collect()
    }
    assert got == dict(expect)


def test_dedup_threshold_curve(spark, sf_dir, jaccard_pairs_03):
    expect = {}
    for pm in (300, 400, 500, 600, 700, 800, 900):
        n = sum(1 for j in jaccard_pairs_03.values() if j >= pm / 1000.0)
        if n:
            expect[pm] = n
    got = {
        r["threshold_pm"]: r["n_pairs"]
        for r in QUERIES["dedup_threshold_curve"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_containment_near_dup(spark, sf_dir, shingles):
    posting: dict[str, list] = defaultdict(list)
    for doc_id in sorted(shingles):
        for sh in shingles[doc_id]:
            posting[sh].append(doc_id)
    common: Counter = Counter()
    for ids in posting.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                common[(ids[i], ids[j])] += 1
    expect = {}
    for (a, b), inter in common.items():
        cont = round_ratio6(inter, min(len(shingles[a]), len(shingles[b])))
        if cont >= 0.5:
            expect[(a, b)] = (inter, cont)
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["containment"])
        for r in QUERIES["containment_near_dup"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_span_dedup_retention(spark, sf_dir, docs):
    keeper: dict[str, tuple] = {}
    spans_by_doc: dict[int, list] = {}
    for r in sorted(docs.itertuples(), key=lambda x: x.doc_id):
        t = filt_tokens(r.text)
        if not t:
            continue
        n = len(t)
        spans = []
        for i in range(math.ceil(n / 20.0)):
            h = hashlib.md5(" ".join(t[i * 20 : i * 20 + 20]).encode()).hexdigest()
            spans.append((i, h, min(20, n - i * 20)))
            if h not in keeper or (r.doc_id, i) < keeper[h]:
                keeper[h] = (r.doc_id, i)
        spans_by_doc[r.doc_id] = (n, spans)
    expect = {}
    for doc_id, (n, spans) in spans_by_doc.items():
        kept = [(i, ln) for i, h, ln in spans if keeper[h] == (doc_id, i)]
        kept_tokens = sum(ln for _, ln in kept)
        expect[doc_id] = (
            n, len(spans), len(kept), kept_tokens, kept_tokens / n
        )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_kept"],
                      r["kept_tokens"], r["retained_frac"])
        for r in QUERIES["span_dedup_retention"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, e in expect.items():
        assert got[k][:4] == e[:4], k
        assert math.isclose(got[k][4], e[4], rel_tol=1e-12, abs_tol=1e-12), k


def _banded_pairs_03(shingles):
    """MinHash-banded candidates (shared params) verified by exact set
    Jaccard at the 0.3 cut — the production pair machinery's contract."""
    cand = _minhash_banded_candidates(shingles)
    out = {}
    for a, b in cand:
        sa, sb = shingles[a], shingles[b]
        inter = len(sa & sb)
        jac = round_ratio6(inter, len(sa) + len(sb) - inter)
        if jac >= 0.3:
            out[(a, b)] = jac
    return out


def test_cross_source_dup_matrix(spark, sf_dir, docs, shingles):
    src = dict(zip(docs["doc_id"], docs["source"]))
    cells: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for (a, b), jac in _banded_pairs_03(shingles).items():
        key = tuple(sorted((src[a], src[b])))
        cells[key][0] += 1
        cells[key][1] += int(round(jac * 1e6))
    expect = {
        # mean of micro-scaled jaccards, rounded half-up to the micro grid
        k: (n, ((micro * 2 + n) // (2 * n)) / 1e6)
        for k, (n, micro) in cells.items()
    }
    got = {
        (r["source_lo"], r["source_hi"]): (r["n_pairs"], r["mean_jaccard"])
        for r in QUERIES["cross_source_dup_matrix"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_decontamination_pairs(spark, sf_dir, shingles):
    cand = _minhash_banded_candidates(shingles)
    expect = {}
    for a, b in cand | {(b, a) for a, b in cand}:
        if _split_bucket(a) < 80 and _split_bucket(b) >= 80:
            sa, sb = shingles[a], shingles[b]
            inter = len(sa & sb)
            jac = round_ratio6(inter, len(sa) + len(sb) - inter)
            if jac >= 0.3:
                expect[(a, b)] = jac
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["decontamination_pairs"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_decontamination_13gram(spark, sf_dir, docs):
    grams = {}
    for r in docs.itertuples():
        t = filt_tokens(r.text)
        if len(t) >= 13:
            grams[r.doc_id] = {
                " ".join(t[i : i + 13]) for i in range(len(t) - 12)
            }
    train = {d for d in grams if _split_bucket(d) < 80}
    held = {d for d in grams if _split_bucket(d) >= 80}
    posting: dict[str, list] = defaultdict(list)
    for d, gs in grams.items():
        for g in gs:
            posting[g].append(d)
    shared: Counter = Counter()
    for ids in posting.values():
        tr = [d for d in ids if d in train]
        ho = [d for d in ids if d in held]
        for a in tr:
            for b in ho:
                shared[(a, b)] += 1
    got = {
        (r["train_id"], r["heldout_id"]): r["n_shared_ngrams"]
        for r in QUERIES["decontamination_13gram"](spark, sf_dir).collect()
    }
    assert got == dict(shared)


def test_winnow_overlap_sources(spark, sf_dir, docs):
    prints: dict[str, set] = defaultdict(set)
    for r in docs.itertuples():
        t = re.sub(r"[^a-z0-9]+", " ", (r.text or "").lower()).strip().split(" ")
        if not (r.text or "").strip():
            t = [""]
        gs = (
            [" ".join(t[i : i + 4]) for i in range(len(t) - 3)]
            if len(t) >= 4 else []
        )
        if not gs:
            continue
        keys = [md5_32(g) * 2_147_483_648 + i for i, g in enumerate(gs)]
        limit = max(len(gs) - 4, 0)
        for i in range(len(gs)):
            if i <= limit:
                prints[r.source].add(min(keys[i : i + 4]) >> 31)
    expect = {}
    sources = sorted(prints)
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            n = len(prints[a] & prints[b])
            if n:
                expect[(a, b)] = n
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_prints"]
        for r in QUERIES["winnow_overlap_sources"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_incremental_dedup_status(spark, sf_dir, docs, shingles):
    cand = _minhash_banded_candidates(shingles)
    sym = cand | {(b, a) for a, b in cand}
    hist_hits, batch_hits = set(), set()
    for a, b in sym:
        sa, sb = shingles[a], shingles[b]
        inter = len(sa & sb)
        jac = round_ratio6(inter, len(sa) + len(sb) - inter)
        if jac < 0.3:
            continue
        if _split_bucket(a) < 80 and _split_bucket(b) >= 80:
            hist_hits.add(b)
        if _split_bucket(a) >= 80 and _split_bucket(b) >= 80 and a < b:
            batch_hits.add(b)
    expect = {}
    for doc_id in docs["doc_id"]:
        if _split_bucket(int(doc_id)) >= 80:
            h = int(doc_id) in hist_hits
            p = int(doc_id) in batch_hits
            expect[int(doc_id)] = (h, p, not h and not p)
    got = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"], r["keep"])
        for r in QUERIES["incremental_dedup_status"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _round6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


@pytest.fixture(scope="module")
def vecs(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    return {
        int(v): [float(x) for x in emb]
        for v, emb in zip(e["vec_id"], e["embedding"])
    }


def test_semantic_dedup(spark, sf_dir, vecs):
    norms = {v: math.sqrt(_fold_dot(x, x)) for v, x in vecs.items()}
    # the registry runs the engine's scale-adaptive default: ceil(sqrt(N))
    cents = sorted(vecs)[: max(1, math.ceil(math.sqrt(len(vecs))))]
    assign = {}
    for v in vecs:
        scored = sorted(
            (
                (-_fold_dot(vecs[v], vecs[c]) / (norms[v] * norms[c]), c)
                for c in cents
            )
        )
        # assignment tie margin: rank-1 vs rank-2 cosine must be decisive
        assert scored[1][0] - scored[0][0] > 1e-9, v
        assign[v] = scored[0][1]
    clusters: dict[int, list] = defaultdict(list)
    for v, c in assign.items():
        clusters[c].append(v)
    drops = set()
    for members in clusters.values():
        ms = sorted(members)
        for i, b in enumerate(ms):
            for a in ms[i + 1 :]:
                cos = _round6(
                    _fold_dot(vecs[a], vecs[b]) / (norms[a] * norms[b])
                )
                if cos >= 0.25:
                    drops.add(a)
    expect = {v: (assign[v], v not in drops) for v in vecs}
    got = {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in QUERIES["semantic_dedup"](spark, sf_dir).collect()
    }
    assert got == expect
    assert drops, "degenerate fixture: nothing dropped"


def test_dedup_embedding_cosine(spark, sf_dir, vecs):
    from aos_spark.llm.similarity import _hyperplanes

    planes = _hyperplanes(64, 4, 7)
    norms = {v: math.sqrt(_fold_dot(x, x)) for v, x in vecs.items()}
    buckets: dict[int, list] = defaultdict(list)
    for v, x in vecs.items():
        b = sum(
            (1 << i) for i, p in enumerate(planes) if _fold_dot(x, p) >= 0.0
        )
        buckets[b].append(v)
    expect = {}
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                cos = _round6(
                    _fold_dot(vecs[a], vecs[b]) / (norms[a] * norms[b])
                )
                if cos >= 0.2:
                    expect[(a, b)] = cos
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in QUERIES["dedup_embedding_cosine"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_dedup_resolution(spark, sf_dir, docs, shingles):
    posting: dict[str, list] = defaultdict(list)
    for doc_id in sorted(shingles):
        for sh in shingles[doc_id]:
            posting[sh].append(doc_id)
    common: Counter = Counter()
    for ids in posting.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                common[(ids[i], ids[j])] += 1
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), inter in common.items():
        union = len(shingles[a]) + len(shingles[b]) - inter
        if round_ratio6(inter, union) >= 0.35:
            parent[find(a)] = find(b)
    comp: dict = defaultdict(list)
    for node in list(parent):
        comp[find(node)].append(node)
    cid = {}
    for members in comp.values():
        lo = min(members)
        for m in members:
            cid[m] = lo
    ranked: dict[int, list] = defaultdict(list)
    lang_of = {}
    for r in docs.itertuples():
        q = _quality(r.text)[4]
        ranked[cid.get(r.doc_id, r.doc_id)].append((-q, r.doc_id))
        lang_of[r.doc_id] = r.lang
    expect: dict[str, list] = defaultdict(lambda: [0, 0, 0])
    for members in ranked.values():
        members.sort()
        for rn, (_negq, doc_id) in enumerate(members, 1):
            e = expect[lang_of[doc_id]]
            e[0] += 1
            e[1 if rn == 1 else 2] += 1
    got = {
        r["lang"]: [r["n_docs"], r["n_kept"], r["n_dropped"]]
        for r in QUERIES["dedup_resolution"](spark, sf_dir).collect()
    }
    assert got == dict(expect)
    assert any(e[2] for e in expect.values()), "degenerate: nothing dropped"


def test_source_minhash_similarity(spark, sf_dir, docs):
    from aos_spark.llm.dedup import MINHASH_PRIME, minhash_params

    params = minhash_params(16)
    hvs: dict[str, list] = defaultdict(list)
    for r in docs.itertuples():
        for s in _shingle_set(r.text):
            hvs[r.source].append(md5_32(s))
    sig = {
        src: [min((h * a + b) % MINHASH_PRIME for h in hs) for a, b in params]
        for src, hs in hvs.items()
    }
    expect = {}
    sources = sorted(sig)
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            n = sum(1 for x, y in zip(sig[a], sig[b]) if x == y)
            expect[(a, b)] = (n, _round6(n / 16.0))
    got = {
        (r["source_a"], r["source_b"]): (r["n_match"], r["est_jaccard"])
        for r in QUERIES["source_minhash_similarity"](spark, sf_dir).collect()
    }
    assert got == expect and expect
