"""Independent-truth checks, wave 12: the remaining curation/analytics
singletons — split/weighted sampling stats, the domain-mixture plan and
its application, chi-square mix residuals, sliding-window chunking, RFM
segmentation, session path mining, consistent-hash re-sharding churn,
link prediction on the embedding near-dup graph, and the Welch t-test.

Replication contract as in waves 1–11: md5 arithmetic with hashlib,
ring successor lookup with bisect over a from-scratch rebuilt ring,
NTILE/section formulas in plain Python, decimal moment sums with
repr-HALF_UP quantization, graph wedges with dict sets.
"""

from __future__ import annotations

import bisect
import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from aos_spark.queries import QUERIES
from test_independent_truth_dedup import _fold_dot, _round6


def _close(a, b, rel=1e-9, abs_=1e-9):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def _q(v: float, scale: int) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal(1).scaleb(-scale), ROUND_HALF_UP
    )


def _round(v: float, scale: int) -> float:
    return float(_q(v, scale))


def round_ratio6(num: int, den: int) -> float:
    return ((num * 2_000_000 + den) // (den * 2)) / 1e6


def md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _apos_tokens(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9']+", (text or "").lower()) if w]


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def test_sample_split_stats(spark, sf_dir, docs):
    acc: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        b = md5_32("split" + str(r.doc_id)) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        acc[(split, r.lang)][0] += 1
        acc[(split, r.lang)][1] += r.n_chars
    got = {
        (r["split"], r["lang"]): [r["n_docs"], r["total_chars"]]
        for r in QUERIES["sample_split_stats"](spark, sf_dir).collect()
    }
    assert got == dict(acc)


def test_weighted_sample_stats(spark, sf_dir, docs):
    ws = {r.doc_id: float(len(r.text or "")) for r in docs.itertuples()}
    mean_w = float(
        sum((_q(w, 6) for w in ws.values()), Decimal(0))
    ) / len(ws)
    acc: dict[str, list] = defaultdict(lambda: [0, Decimal(0)])
    for r in docs.itertuples():
        w = ws[r.doc_id]
        u = (md5_32("wsample" + str(r.doc_id)) % 1_000_000) / 1e6
        if u < min(1.0, 0.2 * w / mean_w):
            acc[r.lang][0] += 1
            acc[r.lang][1] += _q(w, 2)
    got = {
        r["lang"]: (r["n_sampled"], r["total_weight"])
        for r in QUERIES["weighted_sample_stats"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc) and acc
    for k, (n, tw) in acc.items():
        assert got[k][0] == n, k
        _close(got[k][1], float(tw))


_TARGETS = {"en": 0.5, "es": 0.2, "fr": 0.2, "de": 0.1}


def _domain_tokens(docs):
    per: dict[str, list] = defaultdict(lambda: [0, 0])
    tok_of = {}
    for r in docs.itertuples():
        t = len(_apos_tokens(r.text))
        tok_of[r.doc_id] = t
        per[r.lang][0] += 1
        per[r.lang][1] += t
    return per, tok_of


def test_domain_mixture_plan(spark, sf_dir, docs):
    per, _ = _domain_tokens(docs)
    total = sum(v[1] for v in per.values())
    expect = {}
    for dom, (n_docs, n_tokens) in per.items():
        cur = n_tokens / total
        tgt = _TARGETS.get(dom, 0.0)
        keep = min(1.0, tgt / cur)
        expect[dom] = (
            n_docs, n_tokens, cur, tgt, keep, math.floor(n_tokens * keep)
        )
    got = {
        r["domain"]: (r["n_docs"], r["n_tokens"], r["current_share"],
                      r["target_share"], r["keep_rate"], r["expected_tokens"])
        for r in QUERIES["domain_mixture_plan"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, e in expect.items():
        assert got[k][0] == e[0] and got[k][1] == e[1] and got[k][5] == e[5], k
        for g, x in zip(got[k][2:5], e[2:5]):
            _close(g, x, rel=1e-12, abs_=1e-12)


def test_mixture_apply_stats(spark, sf_dir, docs):
    per, tok_of = _domain_tokens(docs)
    total = sum(v[1] for v in per.values())
    thr = {
        dom: int(_q(min(1.0, _TARGETS.get(dom, 0.0) / (nt / total)) * 1e6, 0))
        for dom, (_n, nt) in per.items()
    }
    acc: dict[str, list] = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        if md5_32("mix" + str(r.doc_id)) % 1_000_000 < thr[r.lang]:
            acc[r.lang][0] += 1
            acc[r.lang][1] += tok_of[r.doc_id]
    kt = sum(v[1] for v in acc.values())
    expect = {
        dom: (n, t, _round(t / float(kt), 6)) for dom, (n, t) in acc.items()
    }
    got = {
        r["domain"]: (r["n_kept"], r["kept_tokens"], r["realized_share"])
        for r in QUERIES["mixture_apply_stats"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k, (n, t, share) in expect.items():
        assert got[k][:2] == (n, t), k
        _close(got[k][2], share)


def test_priority_mix_residuals(spark, sf_dir, orders):
    cells = Counter(
        (d.year, p) for d, p in zip(orders["o_orderdate"],
                                    orders["o_orderpriority"])
    )
    yt = Counter()
    pt = Counter()
    for (y, p), n in cells.items():
        yt[y] += n
        pt[p] += n
    total = sum(cells.values())
    expect = {}
    for (y, p), obs in cells.items():
        exp0 = float(yt[y] * pt[p]) / float(total)
        sr = (float(obs) - exp0) / math.sqrt(exp0)
        expect[(y, p)] = (obs, _round(exp0, 4), _round(sr, 6), _round(sr * sr, 6))
    got = {
        (r["year"], r["priority"]):
            (r["obs"], r["expected"], r["std_residual"], r["chi2_cell"])
        for r in QUERIES["priority_mix_residuals"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, e in expect.items():
        assert got[k][0] == e[0], k
        for g, x in zip(got[k][1:], e[1:]):
            _close(g, x, rel=1e-9, abs_=2e-6)


def test_chunk_sliding_window(spark, sf_dir, docs):
    expect = {}
    for r in docs.itertuples():
        t = [w for w in re.split(r"[^a-z0-9]+", (r.text or "").lower()) if w]
        n = len(t)
        n_starts = 0 if n <= 64 else math.ceil((n - 64) / 48)
        for idx in range(n_starts + 1):
            start = idx * 48
            tok_len = max(min(64, n - start), 0)
            if tok_len > 0 or n == 0:
                expect[(r.doc_id, idx)] = (
                    start, tok_len, " ".join(t[start : start + tok_len])
                )
    got = {
        (r["doc_id"], r["chunk_idx"]):
            (r["tok_start"], r["tok_len"], r["chunk_text"])
        for r in QUERIES["chunk_sliding_window"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def _ntile(rows_sorted, k=5):
    n = len(rows_sorted)
    base, extra = divmod(n, k)
    out = []
    pos = 0
    for tile in range(1, k + 1):
        size = base + (1 if tile <= extra else 0)
        out.extend([tile] * size)
        pos += size
    return out


def test_rfm_segmentation(spark, sf_dir, orders):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nm = dict(zip(n["n_nationkey"], n["n_name"]))
    nat_of = {r.c_custkey: nm[r.c_nationkey] for r in c.itertuples()}
    cust: dict[tuple, list] = {}
    for r in orders.itertuples():
        key = (nat_of[r.o_custkey], r.o_custkey)
        e = cust.setdefault(key, [None, 0, Decimal(0)])
        e[0] = r.o_orderdate if e[0] is None else max(e[0], r.o_orderdate)
        e[1] += 1
        e[2] += _q(r.o_totalprice, 2)
    acc: dict[tuple, list] = defaultdict(lambda: [0, Decimal(0)])
    by_nation: dict[str, list] = defaultdict(list)
    for (nat, ck), (last, freq, mon) in cust.items():
        by_nation[nat].append((ck, last, freq, mon))
    for nat, rows in by_nation.items():
        r_order = sorted(rows, key=lambda x: (-x[1].value, x[0]))
        f_order = sorted(rows, key=lambda x: (-x[2], x[0]))
        m_order = sorted(rows, key=lambda x: (-x[3], x[0]))
        r_q = dict(zip((x[0] for x in r_order), _ntile(r_order)))
        f_q = dict(zip((x[0] for x in f_order), _ntile(f_order)))
        m_q = dict(zip((x[0] for x in m_order), _ntile(m_order)))
        for ck, _last, _freq, mon in rows:
            key = (nat, r_q[ck], f_q[ck], m_q[ck])
            acc[key][0] += 1
            acc[key][1] += mon
    got = {
        (r["nation"], r["r_q"], r["f_q"], r["m_q"]):
            (r["n_customers"], r["segment_revenue"])
        for r in QUERIES["rfm_segmentation"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc)
    for k, (n_c, rev) in acc.items():
        assert got[k][0] == n_c, k
        _close(got[k][1], float(rev))


def test_session_path_topk(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    paths: Counter = Counter()
    for _user, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        sessions: list[list] = []
        prev_s = None
        for r in g.itertuples():
            s = r.ts.value // 1_000_000_000  # FLOOR(epoch) whole seconds
            if prev_s is None or s - prev_s > 21600:
                sessions.append([])
            prev_s = s
            sessions[-1].append(r.event_type)
        for types in sessions:
            paths[">".join(types[:5])] += 1
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = {p: (n, i + 1) for i, (p, n) in enumerate(top)}
    got = {
        r["path"]: (r["n_sessions"], r["rank_in_group"])
        for r in QUERIES["session_path_topk"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_shard_rebalance_churn(spark, sf_dir, docs):
    def ring(n_shards):
        rows = []
        for s in range(n_shards):
            for i in range(32):
                rows.append((md5_32(f"{s}:{i}"), s))
        rows.sort()
        return [h for h, _ in rows], [s for _, s in rows]

    def assign(h, hs, ss):
        i = bisect.bisect_left(hs, h)
        return ss[i] if i < len(hs) else ss[0]

    h_old, s_old = ring(8)
    h_new, s_new = ring(9)
    n = len(docs)
    moved_mod = moved_ring = 0
    for doc_id in docs["doc_id"]:
        h = md5_32("shard" + str(doc_id))
        if h % 8 != h % 9:
            moved_mod += 1
        if assign(h, h_old, s_old) != assign(h, h_new, s_new):
            moved_ring += 1
    expect = {
        "mod": (n, moved_mod, round_ratio6(moved_mod, n)),
        "ring": (n, moved_ring, round_ratio6(moved_ring, n)),
    }
    got = {
        r["method"]: (r["n_docs"], r["n_moved"], r["moved_share"])
        for r in QUERIES["shard_rebalance_churn"](spark, sf_dir).collect()
    }
    assert got == expect
    assert moved_ring < moved_mod, "ring must move less than mod"


def test_graph_link_prediction(spark, sf_dir):
    from aos_spark.llm.similarity import _hyperplanes

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    vecs = {
        int(v): [float(x) for x in emb]
        for v, emb in zip(e["vec_id"], e["embedding"])
    }
    planes = _hyperplanes(64, 4, 7)
    norms = {v: math.sqrt(_fold_dot(x, x)) for v, x in vecs.items()}
    buckets: dict[int, list] = defaultdict(list)
    for v, x in vecs.items():
        b = sum((1 << i) for i, p in enumerate(planes) if _fold_dot(x, p) >= 0.0)
        buckets[b].append(v)
    edges = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                if _round6(_fold_dot(vecs[a], vecs[b]) / (norms[a] * norms[b])) >= 0.2:
                    edges.add((a, b))
    adj: dict[int, set] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cand = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            if (x, y) in edges:
                continue
            common = len(adj[x] & adj[y])
            if common:
                cand[(x, y)] = (
                    common, len(adj[x]), len(adj[y]),
                    _round6(common / (len(adj[x]) + len(adj[y]) - common)),
                )
    top = sorted(cand.items(), key=lambda kv: (-kv[1][3], kv[0]))[:50]
    expect = dict(top)
    got = {
        (r["node_a"], r["node_b"]):
            (r["common_n"], r["deg_x"], r["deg_y"], r["jaccard"])
        for r in QUERIES["graph_link_prediction"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_welch_ttest_priorities(spark, sf_dir, orders):
    def stats(pri):
        vals = orders.loc[orders["o_orderpriority"] == pri, "o_totalprice"]
        n = len(vals)
        s = float(sum((_q(v, 2) for v in vals), Decimal(0)))
        ss = float(sum((_q(v, 2) * _q(v, 2) for v in vals), Decimal(0)))
        return n, s, ss

    n1, s1, ss1 = stats("1-URGENT")
    n2, s2, ss2 = stats("5-LOW")
    m1, m2 = s1 / n1, s2 / n2
    v1 = ((ss1 - s1 * s1 / n1) / (n1 - 1.0)) / n1
    v2 = ((ss2 - s2 * s2 / n2) / (n2 - 1.0)) / n2
    t = (m1 - m2) / math.sqrt(v1 + v2)
    df = (v1 + v2) * (v1 + v2) / (v1 * v1 / (n1 - 1.0) + v2 * v2 / (n2 - 1.0))
    got = QUERIES["welch_ttest_priorities"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    _close(got["mean_urgent"], _round(m1 * 10000.0, 0) / 10000.0)
    _close(got["mean_low"], _round(m2 * 10000.0, 0) / 10000.0)
    _close(got["mean_diff"], _round((m1 - m2) * 10000.0, 0) / 10000.0)
    _close(got["t_stat"], _round(t, 6), rel=1e-9, abs_=2e-6)
    _close(got["welch_df"], _round(df, 2), rel=1e-9, abs_=1e-2)
