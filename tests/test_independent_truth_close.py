"""Independent-truth checks, wave 14: the last four registry queries —
deterministic array aggregation, the Pareto revenue share, PPJoin exact
pairs (registry-level; the operator itself is also brute-force-verified
at 5 thresholds in test_setjoin_layout), and the vocabulary Jaccard
matrix — plus the CAPSTONE meta-test: every key in the 203-query
registry must be exercised by some independent-truth replica, so the
coverage is self-maintaining (a new query fails this test until it gets
an author-independent check).
"""

from __future__ import annotations

import ast
import glob
import math
import os
import re
from collections import Counter, defaultdict
from decimal import Decimal

import pandas as pd
import pytest

from aos_spark.queries import QUERIES
from test_independent_truth_ml import _shingle_set
from test_independent_truth_tpch import _q, _round


def _close(a, b, rel=1e-9, abs_=1e-9):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def round_ratio6(num: int, den: int) -> float:
    return ((num * 2_000_000 + den) // (den * 2)) / 1e6


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_array_agg_sorted(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    expect = {}
    for pri, g in o.groupby("o_orderpriority"):
        expect[pri] = (
            ",".join(sorted(set(g["o_orderstatus"]))),
            g["o_custkey"].nunique(),
        )
    got = {
        r["o_orderpriority"]: (r["statuses"], r["n_customers"])
        for r in QUERIES["array_agg_sorted"](spark, sf_dir).collect()
    }
    assert got == expect


def test_revenue_pareto_by_nation(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nm = dict(zip(n["n_nationkey"], n["n_name"]))
    nat_of = {r.c_custkey: nm[r.c_nationkey] for r in c.itertuples()}
    rev: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in o.itertuples():
        rev[(nat_of[r.o_custkey], r.o_custkey)] += _q(r.o_totalprice, 2)
    by_nation: dict[str, list] = defaultdict(list)
    for (nat, ck), v in rev.items():
        by_nation[nat].append((-v, ck))
    expect = {}
    for nat, rows in by_nation.items():
        rows.sort()
        n_cust = len(rows)
        top_k = math.ceil(n_cust * 0.1)
        top_sum = float(sum((-negv for negv, _ in rows[:top_k]), Decimal(0)))
        total = float(sum((-negv for negv, _ in rows), Decimal(0)))
        expect[nat] = (n_cust, top_k, _round(top_sum / total, 6))
    got = {
        r["nation"]: (r["n_customers"], r["n_top_customers"],
                      r["top_decile_share"])
        for r in QUERIES["revenue_pareto_by_nation"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (nc, tk, share) in expect.items():
        assert got[k][:2] == (nc, tk), k
        _close(got[k][2], share)


def test_ppjoin_exact_pairs(spark, sf_dir, docs):
    shingles = {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}
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
        union = len(shingles[a]) + len(shingles[b]) - inter
        if inter / union >= 0.5:  # the filter is the RAW ratio
            expect[(a, b)] = round_ratio6(inter, union)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["ppjoin_exact_pairs"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_vocab_jaccard_matrix(spark, sf_dir, docs):
    vocab: dict[str, set] = defaultdict(set)
    for r in docs.itertuples():
        t = re.sub(r"[^a-z0-9]+", " ", (r.text or "").lower()).strip()
        vocab[r.source] |= set(t.split(" ")) if t else {""}
    expect = {}
    sources = sorted(vocab)
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            union = len(vocab[a]) + len(vocab[b]) - inter
            if inter:
                expect[(a, b)] = (inter, union, _round(inter / union, 6))
    got = {
        (r["source_a"], r["source_b"]): (r["inter_n"], r["union_n"], r["jaccard"])
        for r in QUERIES["vocab_jaccard_matrix"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k, (i_n, u_n, jac) in expect.items():
        assert got[k][:2] == (i_n, u_n), k
        _close(got[k][2], jac)


def _invoked_queries(tree: "ast.Module") -> set[str]:
    """Query names actually INVOKED inside an asserting test function.

    ADVICE r11 / VERDICT r11 "Next round" #2: the old regex matcher counted
    any string mention (comments, docstrings, parametrize lists) as
    coverage. This walks the AST instead and counts a name only when, inside
    a ``test_*`` function that contains at least one ``assert`` statement,
    one of the engine-invocation forms appears:

    - ``QUERIES["name"](...)`` — the registry callable is *called*;
    - ``_rows(..., "name")`` / ``_spark_topk(..., "name")`` — the shared
      collect helpers (which call ``QUERIES[name]`` internally).

    A name in a comment or docstring can never match (AST drops comments;
    docstrings are bare Constant Exprs, not Call nodes), and deleting a
    test's assertions un-covers every name it invoked.
    """
    covered: set[str] = set()
    for node in ast.walk(tree):
        if not (isinstance(node, ast.FunctionDef) and node.name.startswith("test_")):
            continue
        # "asserting" = a bare assert statement OR a call to the
        # per-module _close helper (which asserts math.isclose internally).
        def _asserts(n: "ast.AST") -> bool:
            return isinstance(n, ast.Assert) or (
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Name)
                and n.func.id == "_close"
            )

        if not any(_asserts(n) for n in ast.walk(node)):
            continue
        for call in ast.walk(node):
            if not isinstance(call, ast.Call):
                continue
            f = call.func
            # QUERIES["name"](spark, sf_dir)
            if (
                isinstance(f, ast.Subscript)
                and isinstance(f.value, ast.Name)
                and f.value.id == "QUERIES"
                and isinstance(f.slice, ast.Constant)
                and isinstance(f.slice.value, str)
            ):
                covered.add(f.slice.value)
            # _rows(spark, sf_dir, "name") / _spark_topk(spark, sf_dir, "name")
            elif isinstance(f, ast.Name) and f.id in ("_rows", "_spark_topk"):
                for a in call.args:
                    if isinstance(a, ast.Constant) and isinstance(a.value, str):
                        covered.add(a.value)
    return covered


def test_truth_registry_complete():
    """CAPSTONE: every registry query has an independent-truth replica.
    A new queries() entry fails here until someone writes one — the
    coverage can no longer silently regress. Coverage is counted from
    AST invocation sites inside asserting tests (see _invoked_queries),
    so a name surviving only as a string literal no longer passes."""
    here = os.path.dirname(__file__)
    covered: set[str] = set()
    for f in glob.glob(os.path.join(here, "test_independent_truth*.py")):
        covered |= _invoked_queries(ast.parse(open(f).read(), filename=f))
    missing = sorted(set(QUERIES) - covered)
    assert not missing, f"queries without an independent-truth replica: {missing}"
    # The invocation set should also stay inside the registry — a replica
    # pinned to a renamed/removed query is stale evidence.
    stale = sorted(covered - set(QUERIES))
    assert not stale, f"replicas invoking unregistered queries: {stale}"


def test_truth_matcher_semantics():
    """The coverage matcher itself is locked: mentions don't count,
    invocations without assertions don't count, real replicas do."""
    src = '''
def test_real(spark, sf_dir):
    """docstring mentions "doc_mentioned" only."""
    # comment mentions "comment_mentioned" only
    got = QUERIES["invoked_asserted"](spark, sf_dir).collect()
    assert got

def test_helper(spark, sf_dir):
    got = _rows(spark, sf_dir, "helper_asserted")
    _close(got, 1.0)

def test_no_assert(spark, sf_dir):
    QUERIES["invoked_unasserted"](spark, sf_dir).collect()

def not_a_test(spark, sf_dir):
    got = QUERIES["outside_test"](spark, sf_dir).collect()
    assert got

PARAM = ["parametrize_mentioned"]
'''
    got = _invoked_queries(ast.parse(src))
    assert got == {"invoked_asserted", "helper_asserted"}, got
