"""Independent-truth checks, wave 5: data-quality / profiling /
reconciliation plus the remaining singleton families — SimHash dedup,
threshold levenshtein, one Lloyd iteration, sessionization, and hourly
gap-fill.

Same replication contract as waves 1–4 (shared parameters imported,
every algorithm recomputed from first principles with a different
technique where the definition allows): pandas nunique/isna passes vs
the explode-and-hash-aggregate profile plan; dict bucket checksums vs
the 256-bucket anti-entropy frames; a classic two-row DP levenshtein vs
Spark's banded-threshold kernel and DuckDB's matrix; pure-Python
bit-majority SimHash (dict accumulators, no numpy) vs the vectorized
Arrow UDF; Decimal-exact Lloyd assignment vs the Catalyst decimal
aggregate; per-user Python session walks and a pandas ffill spine vs
partitioned windows.
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


def _close(a, b, rel=1e-6, abs_=2e-6):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def _round_half_up(v: float, scale: int) -> float:
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP))


def _dsum(values, scale: int) -> float:
    q = Decimal(1).scaleb(-scale)
    return float(
        sum(Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP) for v in values)
    )


def md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


# ----------------------------------------------------------- profiling


def test_profile_columns_matches_pandas(spark, sf_dir, orders):
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    got = {
        r["column"]: r.asDict()
        for r in QUERIES["profile_columns"](spark, sf_dir).collect()
    }
    assert set(got) == set(num_cols + str_cols)
    for c in num_cols + str_cols:
        col = orders[c]
        r = got[c]
        assert r["n_rows"] == len(orders)
        assert r["n_nulls"] == int(col.isna().sum())
        assert r["n_distinct"] == int(col.nunique(dropna=True)), c
        if c in num_cols:
            _close(r["min_num"], float(col.min()), rel=1e-12)
            _close(r["max_num"], float(col.max()), rel=1e-12)
            assert r["min_str"] is None and r["max_str"] is None
        else:
            assert (r["min_str"], r["max_str"]) == (col.min(), col.max())
            assert r["min_num"] is None and r["max_num"] is None


def test_validation_suite_matches_pandas(spark, sf_dir, orders):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    dup = orders.groupby("o_orderkey").size()
    expect = {
        "not_null:o_custkey": int(orders["o_custkey"].isna().sum()),
        "unique:o_orderkey": int((dup[dup > 1] - 1).sum()),
        "accepted_values:o_orderstatus": int(
            (~orders["o_orderstatus"].isin(["P", "O", "F"])
             | orders["o_orderstatus"].isna()).sum()
        ),
        "referential:l_orderkey->o_orderkey": int(
            (~li["l_orderkey"].isin(set(orders["o_orderkey"]))).sum()
        ),
        "referential:o_custkey->c_custkey": int(
            (~orders["o_custkey"].isin(set(cust["c_custkey"]))).sum()
        ),
    }
    got = {
        r["check"]: r["n_failed"]
        for r in QUERIES["validation_suite"](spark, sf_dir).collect()
    }
    assert got == expect


def _row_checksum(vals) -> int:
    """Replica of the reconcile row hash: md5 over chr(31)-joined
    shortest-repr strings, NULLs spelled chr(0)+'null'."""
    parts = []
    for v in vals:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            parts.append("\x00null")
        elif isinstance(v, float):
            parts.append(repr(v))
        else:
            parts.append(str(v))
    return md5_32("\x1f".join(parts))


def test_reconcile_tables_matches_dict_buckets(spark, sf_dir, orders):
    """256-bucket anti-entropy frames recomputed with dict accumulation
    over hashlib row checksums, including the perturbation."""
    a_n: Counter = Counter()
    a_sum: Counter = Counter()
    b_n: Counter = Counter()
    b_sum: Counter = Counter()
    for r in orders.itertuples():
        bucket = md5_32(str(r.o_orderkey)) % 256
        a_n[bucket] += 1
        a_sum[bucket] += _row_checksum(
            (r.o_orderkey, r.o_custkey, r.o_orderstatus, float(r.o_totalprice))
        )
        if r.o_orderkey % 997 != 0:
            tp = (
                float(r.o_totalprice) + 1.0
                if r.o_custkey % 101 == 0
                else float(r.o_totalprice)
            )
            b_n[bucket] += 1
            b_sum[bucket] += _row_checksum(
                (r.o_orderkey, r.o_custkey, r.o_orderstatus, tp)
            )
    expect = {}
    for bucket in set(a_n) | set(b_n):
        expect[bucket] = (
            a_n.get(bucket, 0),
            b_n.get(bucket, 0),
            a_n.get(bucket, 0) == b_n.get(bucket, 0)
            and a_sum.get(bucket, 0) == b_sum.get(bucket, 0),
        )
    got = {
        r["bucket"]: (r["n_rows_a"], r["n_rows_b"], r["match"])
        for r in QUERIES["reconcile_tables"](spark, sf_dir).collect()
    }
    assert got == expect
    assert any(not m for _, _, m in expect.values()), "degenerate: no diffs"
    assert any(m for _, _, m in expect.values()), "degenerate: all diff"


# --------------------------------------------------------------- dedup


def test_dedup_simhash_matches_pure_python(spark, sf_dir, docs):
    """SimHash signatures via dict bit-accumulators (no numpy), banding
    via plain dicts, Hamming via bin().count — pairs exact."""
    sigs = {}
    for r in docs.itertuples():
        toks = [w for w in re.sub(r"[^a-z0-9]+", " ", (r.text or "").lower()).split() if w]
        acc = [0] * 64
        for tok in toks:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        sig = 0
        for b in range(64):
            if acc[b] > 0:
                sig |= 1 << b
        sigs[r.doc_id] = sig
    buckets: dict[tuple, list] = defaultdict(list)
    for doc_id, sig in sigs.items():
        for band in range(4):
            buckets[(band, (sig >> (band * 16)) & 0xFFFF)].append(doc_id)
    expect = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(sigs[ids[i]] ^ sigs[ids[j]]).count("1")
                if ham <= 3:
                    expect[(ids[i], ids[j])] = ham
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in QUERIES["dedup_simhash"](spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "degenerate fixture: no simhash near-dups"


def _lev(a: str, b: str) -> int:
    """Classic two-row DP levenshtein — neither Spark's banded-threshold
    kernel nor DuckDB's full matrix."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_match_levenshtein_matches_dp(spark, sf_dir, docs):
    blocks: dict[tuple, list] = defaultdict(list)
    for r in docs.itertuples():
        blocks[(r.lang, r.n_chars // 64)].append((r.doc_id, (r.text or "")[:32]))
    expect = {}
    for rows in blocks.values():
        rows.sort()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = _lev(rows[i][1], rows[j][1])
                if d <= 8:
                    expect[(rows[i][0], rows[j][0])] = d
    got = {
        (r["id_a"], r["id_b"]): r["lev"]
        for r in QUERIES["fuzzy_match_levenshtein"](spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "degenerate fixture: no fuzzy matches"


# ------------------------------------------------------------ k-means


def test_kmeans_lloyd_step_matches_decimal_replica(spark, sf_dir):
    """One Lloyd iteration with Python Decimal distance accumulation
    (vs the Catalyst decimal aggregate) — assignments, member counts,
    and rounded centroids."""
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    ids = list(e["vec_id"])
    vecs = {
        v: [float(x) for x in emb] for v, emb in zip(e["vec_id"], e["embedding"])
    }
    cents = {cid: vecs[cid] for cid in sorted(ids)[:4]}
    q15 = Decimal(1).scaleb(-15)
    assign = {}
    for v in ids:
        best = None
        for cid in sorted(cents):
            d = sum(
                Decimal(repr((vecs[v][t] - cents[cid][t]) ** 2)).quantize(
                    q15, ROUND_HALF_UP
                )
                for t in range(len(vecs[v]))
            )
            if best is None or d < best[0]:
                best = (d, cid)
        assign[v] = best[1]
    members: dict[int, list] = defaultdict(list)
    for v, cid in assign.items():
        members[cid].append(v)
    q12 = Decimal(1).scaleb(-12)
    expect = {}
    for cid, vs in members.items():
        for dim in range(len(next(iter(vecs.values())))):
            s = sum(
                Decimal(repr(vecs[v][dim])).quantize(q12, ROUND_HALF_UP)
                for v in vs
            )
            expect[(cid, dim)] = (
                len(vs), _round_half_up(float(s) / len(vs), 6)
            )
    got = {
        (r["cluster_id"], r["dim"]): (r["n_members"], r["centroid"])
        for r in QUERIES["kmeans_lloyd_step"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, c) in expect.items():
        assert got[k][0] == n, k
        _close(got[k][1], c, rel=1e-9, abs_=1e-9)


# ----------------------------------------------------- sessions / time


def test_sessionize_events_matches_user_walk(spark, sf_dir, events):
    """Per-user Python walk over microsecond-exact gaps vs the lag/
    running-sum window plan; per-session aggregates decimal-exact."""
    fmt = "%Y-%m-%d %H:%M:%S"
    expect = {}
    for user, g in events.sort_values(["ts", "event_id"]).groupby("user_id"):
        sid = 0
        prev_us = None
        rows: dict[int, list] = defaultdict(list)
        for r in g.itertuples():
            us = r.ts.value // 1000  # datetime64[us] → ns value; keep µs
            if prev_us is None or (us - prev_us) / 1e6 > 21600:
                sid += 1
            prev_us = us
            rows[sid].append(r)
        for sid, rr in rows.items():
            expect[(user, sid)] = (
                min(x.ts for x in rr).strftime(fmt),
                max(x.ts for x in rr).strftime(fmt),
                len(rr),
                _dsum((x.value for x in rr), 2),
            )
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value"]
        )
        for r in QUERIES["sessionize_events"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (s0, s1, n, tv) in expect.items():
        assert got[k][:3] == (s0, s1, n), k
        _close(got[k][3], tv, rel=1e-12, abs_=1e-9)
    assert max(sid for _, sid in expect) > 1, "degenerate: one session each"


def test_gapfill_hourly_events_matches_pandas_ffill(spark, sf_dir, events):
    ev = events.assign(h=events["ts"].dt.floor("h"))
    h0, h1 = ev["h"].min(), ev["h"].max()
    spine_hours = pd.date_range(h0, h1, freq="h")
    hourly = {
        (t, h): (len(g), _dsum(g["value"], 6))
        for (t, h), g in ev.groupby(["event_type", "h"])
    }
    expect = {}
    for t in ev["event_type"].unique():
        carry = None
        for h in spine_hours:
            n, s = hourly.get((t, h), (0, None))
            if s is not None:
                carry = s
            expect[(t, h.to_pydatetime())] = (
                n, 0.0 if s is None else s, carry
            )
    got = {
        (r["event_type"], r["window_start"]): (
            r["n_events"], r["sum_value"], r["ffill_sum_value"]
        )
        for r in QUERIES["gapfill_hourly_events"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, s, carry) in expect.items():
        assert got[k][0] == n, k
        _close(got[k][1], s, rel=1e-12, abs_=1e-9)
        if carry is None:
            assert got[k][2] is None, k
        else:
            _close(got[k][2], carry, rel=1e-12, abs_=1e-9)
    assert any(v[0] == 0 for v in expect.values()), "degenerate: no gaps"
