"""Independent-truth checks, wave 6: the TPC-H sweep (Q2–Q22; Q1 is in
wave 1) replicated in pandas/pure-Python.

The gate already proves Spark == DuckDB on these; this wave removes the
shared-author blind spot by recomputing every query with pandas merges,
dict walks, and explicit Decimal quantization instead of either engine's
planner. Decimal idioms follow the query definitions exactly: per-row
CAST(expr AS DECIMAL(18,4)) is `Decimal(repr(float_expr)).quantize(1e-4,
HALF_UP)` (Spark casts double→decimal through the shortest repr), sums
stay exact in Decimal, and the final double/ROUND steps are replicated
with the same repr-based HALF_UP rounding. Integer outputs compare
EXACTLY; rounded doubles within 1e-9 (a real rounding divergence is
≥ 5e-7 and cannot hide).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from aos_spark.queries import QUERIES


def _close(a, b, rel=1e-9, abs_=1e-9):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def _q(v: float, scale: int) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal(1).scaleb(-scale), ROUND_HALF_UP
    )


def _round(v: float, scale: int) -> float:
    return float(_q(v, scale))


def _rev4(ep: float, disc: float) -> Decimal:
    """CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))."""
    return _q(ep * (1.0 - disc), 4)


@pytest.fixture(scope="module")
def t(sf_dir):
    return {
        name: pd.read_parquet(f"{sf_dir}/{name}.parquet")
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem")
    }


def _rows(spark, sf_dir, name):
    return [r.asDict() for r in QUERIES[name](spark, sf_dir).collect()]


def test_q2_min_cost_supplier(spark, sf_dir, t):
    li = t["lineitem"].merge(
        t["part"][t["part"]["p_type"] == "LARGE"],
        left_on="l_partkey", right_on="p_partkey",
    )
    min_price = li.groupby("p_partkey")["l_extendedprice"].transform("min")
    hit = li[li["l_extendedprice"] == min_price].merge(
        t["supplier"], left_on="l_suppkey", right_on="s_suppkey"
    )
    expect = {
        (r.p_partkey, r.p_name, r.s_name, _round(r.l_extendedprice, 2))
        for r in hit.itertuples()
    }
    got = {
        (r["p_partkey"], r["p_name"], r["s_name"], r["min_price"])
        for r in QUERIES["q2_min_cost_supplier"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_q3_shipping_priority(spark, sf_dir, t):
    cut = pd.Timestamp("1995-03-15")
    j = (
        t["lineitem"][t["lineitem"]["l_shipdate"] > cut]
        .merge(t["orders"][t["orders"]["o_orderdate"] < cut],
               left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["customer"][t["customer"]["c_mktsegment"] == "BUILDING"],
               left_on="o_custkey", right_on="c_custkey")
    )
    rev: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in j.itertuples():
        rev[(r.l_orderkey, r.o_orderpriority)] += _rev4(
            r.l_extendedprice, r.l_discount
        )
    ranked = sorted(rev.items(), key=lambda kv: (-float(kv[1]), kv[0][0]))
    expect = [
        (k[0], k[1], _round(float(v), 4), i + 1)
        for i, (k, v) in enumerate(ranked[:10])
    ]
    got = sorted(
        ((r["l_orderkey"], r["o_orderpriority"], r["revenue"], r["rank"])
         for r in QUERIES["q3_shipping_priority"](spark, sf_dir).collect()),
        key=lambda x: x[3],
    )
    assert got == expect and expect


def test_q4_priority_semijoin(spark, sf_dir, t):
    o = t["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1997-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1997-04-01"))]
    j = t["lineitem"][["l_orderkey", "l_shipdate"]].merge(
        o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    late = j[j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=70)]
    expect = dict(
        late.drop_duplicates("o_orderkey")
        .groupby("o_orderpriority").size()
    )
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in QUERIES["q4_priority_semijoin"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_q5_regional_revenue(spark, sf_dir, t):
    asia = t["region"][t["region"]["r_name"] == "ASIA"]
    n = t["nation"].merge(asia, left_on="n_regionkey", right_on="r_regionkey")
    j = (
        t["lineitem"]
        .merge(t["orders"], left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
        .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
    )
    j = j[j["c_nationkey"] == j["s_nationkey"]].merge(
        n, left_on="s_nationkey", right_on="n_nationkey"
    )
    rev: dict[str, Decimal] = defaultdict(Decimal)
    for r in j.itertuples():
        rev[r.n_name] += _rev4(r.l_extendedprice, r.l_discount)
    expect = {k: _round(float(v), 4) for k, v in rev.items()}
    got = {
        r["n_name"]: r["revenue"]
        for r in QUERIES["q5_regional_revenue"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k in expect:
        _close(got[k], expect[k])


def test_q6_discount_revenue(spark, sf_dir, t):
    li = t["lineitem"]
    m = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
        & (li["l_discount"] >= 0.05) & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    ]
    total = sum(
        (_q(r.l_extendedprice * r.l_discount, 4) for r in m.itertuples()),
        Decimal(0),
    )
    got = QUERIES["q6_discount_revenue"](spark, sf_dir).collect()[0]
    _close(got["revenue"], _round(float(total), 4))


def test_q7_volume_shipping(spark, sf_dir, t):
    li = t["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))]
    nat = dict(zip(t["nation"]["n_nationkey"], t["nation"]["n_name"]))
    j = (
        li.merge(t["orders"], left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
        .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
    )
    rev: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in j.itertuples():
        sn, cn = nat[r.s_nationkey], nat[r.c_nationkey]
        if {sn, cn} == {"NATION_1", "NATION_2"}:
            rev[(sn, cn, r.l_shipdate.year)] += _rev4(
                r.l_extendedprice, r.l_discount
            )
    expect = {k: _round(float(v), 4) for k, v in rev.items()}
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in QUERIES["q7_volume_shipping"](spark, sf_dir).collect()
    }
    # the NATION_1 x NATION_2 x 1996-97 cell is empty at sf0.001 (both
    # sides agree on emptiness); sf0.01 exercises real values
    assert set(got) == set(expect)
    for k in expect:
        _close(got[k], expect[k])


def test_q8_market_share(spark, sf_dir, t):
    asia_keys = set(
        t["nation"].merge(
            t["region"][t["region"]["r_name"] == "ASIA"],
            left_on="n_regionkey", right_on="r_regionkey",
        )["n_nationkey"]
    )
    nat = dict(zip(t["nation"]["n_nationkey"], t["nation"]["n_name"]))
    o = t["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1996-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1998-01-01"))]
    j = (
        t["lineitem"]
        .merge(t["part"][t["part"]["p_type"] == "PROMO"],
               left_on="l_partkey", right_on="p_partkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
        .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j["c_nationkey"].isin(asia_keys)]
    tot: dict[int, Decimal] = defaultdict(Decimal)
    nr: dict[int, Decimal] = defaultdict(Decimal)
    for r in j.itertuples():
        year = r.o_orderdate.year
        v = _rev4(r.l_extendedprice, r.l_discount)
        tot[year] += v
        if nat[r.s_nationkey] == "NATION_1":
            nr[year] += v
    expect = {
        y: _round(float(nr[y]) / float(tot[y]), 6) for y in tot
    }
    got = {
        r["o_year"]: r["mkt_share"]
        for r in QUERIES["q8_market_share"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for y in expect:
        _close(got[y], expect[y])


def test_q9_profit_by_nation(spark, sf_dir, t):
    nat = dict(zip(t["nation"]["n_nationkey"], t["nation"]["n_name"]))
    j = (
        t["lineitem"]
        .merge(t["part"][t["part"]["p_name"].str.contains("red")],
               left_on="l_partkey", right_on="p_partkey")
        .merge(t["orders"], left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    )
    acc: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in j.itertuples():
        profit = (
            r.l_extendedprice * (1.0 - r.l_discount)
            - r.p_retailprice * r.l_quantity * 0.1
        )
        acc[(nat[r.s_nationkey], r.o_orderdate.year)] += _q(profit, 4)
    expect = {k: _round(float(v), 4) for k, v in acc.items()}
    got = {
        (r["nation"], r["o_year"]): r["sum_profit"]
        for r in QUERIES["q9_profit_by_nation"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k in expect:
        _close(got[k], expect[k])


def test_q10_returned_item_customers(spark, sf_dir, t):
    o = t["orders"]
    o = o[(o["o_orderdate"] >= pd.Timestamp("1996-01-01"))
          & (o["o_orderdate"] < pd.Timestamp("1996-07-01"))]
    nat = dict(zip(t["nation"]["n_nationkey"], t["nation"]["n_name"]))
    j = (
        t["lineitem"][t["lineitem"]["l_returnflag"] == "R"]
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
    )
    acc: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in j.itertuples():
        val = _q(r.l_extendedprice, 2) * (Decimal(1) - _q(r.l_discount, 2))
        acc[(r.c_custkey, r.c_name, nat[r.c_nationkey], r.c_acctbal)] += val
    top = sorted(acc.items(), key=lambda kv: (-float(kv[1]), kv[0][0]))[:20]
    expect = [(k[0], k[1], k[2], k[3], float(v)) for k, v in top]
    got = [
        (r["c_custkey"], r["c_name"], r["n_name"], r["c_acctbal"], r["revenue"])
        for r in QUERIES["q10_returned_item_customers"](spark, sf_dir).collect()
    ]
    assert got == expect and expect


def test_q11_important_parts(spark, sf_dir, t):
    acc: dict[int, Decimal] = defaultdict(Decimal)
    for r in t["lineitem"].itertuples():
        acc[r.l_partkey] += _rev4(r.l_extendedprice, r.l_discount)
    cut = float(sum(acc.values(), Decimal(0))) * 0.0007
    expect = {
        k: _round(float(v), 4) for k, v in acc.items() if float(v) > cut
    }
    got = {
        r["l_partkey"]: r["part_value"]
        for r in QUERIES["q11_important_parts"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k in expect:
        _close(got[k], expect[k])


def test_q12_shipmode_priority(spark, sf_dir, t):
    li = t["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))]
    j = li.merge(t["orders"], left_on="l_orderkey", right_on="o_orderkey")
    hi = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    expect = {
        flag: (int(hi[g.index].sum()), int((~hi[g.index]).sum()))
        for flag, g in j.groupby("l_returnflag")
    }
    got = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in QUERIES["q12_shipmode_priority"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_q13_customer_distribution(spark, sf_dir, t):
    o = t["orders"][t["orders"]["o_orderpriority"] != "1-URGENT"]
    per_cust = Counter(o["o_custkey"])
    dist = Counter(
        per_cust.get(ck, 0) for ck in t["customer"]["c_custkey"]
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in QUERIES["q13_customer_distribution"](spark, sf_dir).collect()
    }
    assert got == dict(dist) and dist


def test_q14_promo_revenue(spark, sf_dir, t):
    li = t["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))]
    j = li.merge(t["part"], left_on="l_partkey", right_on="p_partkey")
    promo = total = Decimal(0)
    for r in j.itertuples():
        v = _rev4(r.l_extendedprice, r.l_discount)
        total += v
        if r.p_type == "PROMO":
            promo += v
    got = QUERIES["q14_promo_revenue"](spark, sf_dir).collect()[0]
    _close(
        got["promo_revenue_pct"],
        _round(100.0 * float(promo) / float(total), 6),
    )


def test_q15_top_supplier(spark, sf_dir, t):
    li = t["lineitem"]
    li = li[(li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1997-04-01"))]
    acc: dict[int, Decimal] = defaultdict(Decimal)
    for r in li.itertuples():
        acc[r.l_suppkey] += _rev4(r.l_extendedprice, r.l_discount)
    mx = max(acc.values())
    names = dict(zip(t["supplier"]["s_suppkey"], t["supplier"]["s_name"]))
    expect = {
        (k, names[k], _round(float(v), 4)) for k, v in acc.items() if v == mx
    }
    got = {
        (r["s_suppkey"], r["s_name"], r["total_revenue"])
        for r in QUERIES["q15_top_supplier"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_q16_supplier_count(spark, sf_dir, t):
    bad = set(
        t["supplier"][t["supplier"]["s_name"].str.contains("00000001")]
        ["s_suppkey"]
    )
    p = t["part"]
    p = p[(p["p_brand"] != "Brand#1")
          & (p["p_size"].isin([1, 4, 7, 10, 13, 16, 19, 22]))]
    j = t["lineitem"].merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j[~j["l_suppkey"].isin(bad)]
    sets: dict[tuple, set] = defaultdict(set)
    for r in j.itertuples():
        sets[(r.p_brand, r.p_type, r.p_size)].add(r.l_suppkey)
    expect = {k: len(v) for k, v in sets.items()}
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in QUERIES["q16_supplier_count"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_q17_small_quantity_revenue(spark, sf_dir, t):
    li = t["lineitem"]
    sums: dict[int, Decimal] = defaultdict(Decimal)
    counts: Counter = Counter()
    for r in li.itertuples():
        sums[r.l_partkey] += _q(r.l_quantity, 2)
        counts[r.l_partkey] += 1
    q6 = Decimal(1).scaleb(-6)
    total = Decimal(0)
    for r in li.itertuples():
        # Spark avg(decimal(18,2)) → decimal(22,6), HALF_UP division
        avg = (sums[r.l_partkey] / counts[r.l_partkey]).quantize(
            q6, ROUND_HALF_UP
        )
        if r.l_quantity < float(avg) * 0.2:
            total += _q(r.l_extendedprice, 4)
    got = QUERIES["q17_small_quantity_revenue"](spark, sf_dir).collect()[0]
    _close(got["avg_yearly"], _round(float(total) / 7.0, 4))


def test_q18_large_volume_orders(spark, sf_dir, t):
    qty: dict[int, Decimal] = defaultdict(Decimal)
    for r in t["lineitem"].itertuples():
        qty[r.l_orderkey] += _q(r.l_quantity, 2)
    big = {k: float(v) for k, v in qty.items() if float(v) > 250.0}
    o = t["orders"].merge(
        t["customer"], left_on="o_custkey", right_on="c_custkey"
    )
    expect = {
        (r.c_name, r.o_orderkey, r.o_totalprice, big[r.o_orderkey])
        for r in o.itertuples() if r.o_orderkey in big
    }
    got = {
        (r["c_name"], r["o_orderkey"], r["o_totalprice"], r["sum_qty"])
        for r in QUERIES["q18_large_volume_orders"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_q19_disjunctive_revenue(spark, sf_dir, t):
    j = t["lineitem"].merge(t["part"], left_on="l_partkey", right_on="p_partkey")
    total = Decimal(0)
    for r in j.itertuples():
        ok = (
            (r.p_brand == "Brand#12" and 1 <= r.p_size <= 5
             and 1 <= r.l_quantity <= 11)
            or (r.p_brand == "Brand#23" and 1 <= r.p_size <= 10
                and 10 <= r.l_quantity <= 20)
            or (r.p_brand == "Brand#34" and 1 <= r.p_size <= 15
                and 20 <= r.l_quantity <= 30)
        )
        if ok:
            total += _rev4(r.l_extendedprice, r.l_discount)
    got = QUERIES["q19_disjunctive_revenue"](spark, sf_dir).collect()[0]
    if total == 0:
        # no qualifying row at this SF: SUM over zero rows is NULL on
        # both engine sides — the replica must expect that, not 0.0
        assert got["revenue"] is None
    else:
        _close(got["revenue"], _round(float(total), 4))


def test_q20_promotion_suppliers(spark, sf_dir, t):
    small = t["part"][t["part"]["p_name"].str.startswith("small")]
    j = t["lineitem"].merge(small, left_on="l_partkey", right_on="p_partkey")
    qty: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in j.itertuples():
        qty[(r.l_suppkey, r.l_partkey)] += _q(r.l_quantity, 2)
    promo_keys = {sk for (sk, _pk), v in qty.items() if float(v) > 80.0}
    n3 = set(
        t["nation"][t["nation"]["n_name"] == "NATION_3"]["n_nationkey"]
    )
    expect = {
        (r.s_suppkey, r.s_name)
        for r in t["supplier"].itertuples()
        if r.s_nationkey in n3 and r.s_suppkey in promo_keys
    }
    got = {
        (r["s_suppkey"], r["s_name"])
        for r in QUERIES["q20_promotion_suppliers"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_q21_sole_blocker_suppliers(spark, sf_dir, t):
    li = t["lineitem"]
    order_supps: dict[int, set] = defaultdict(set)
    order_r_supps: dict[int, set] = defaultdict(set)
    for r in li.itertuples():
        order_supps[r.l_orderkey].add(r.l_suppkey)
        if r.l_returnflag == "R":
            order_r_supps[r.l_orderkey].add(r.l_suppkey)
    f_orders = set(
        t["orders"][t["orders"]["o_orderstatus"] == "F"]["o_orderkey"]
    )
    names = dict(zip(t["supplier"]["s_suppkey"], t["supplier"]["s_name"]))
    counts: Counter = Counter()
    for ok, r_supps in order_r_supps.items():
        if ok not in f_orders:
            continue
        for sk in r_supps:
            others = order_supps[ok] - {sk}
            if others and not (r_supps - {sk}):
                counts[names[sk]] += 1
    got = {
        r["s_name"]: r["numwait"]
        for r in QUERIES["q21_sole_blocker_suppliers"](spark, sf_dir).collect()
    }
    assert got == dict(counts) and counts


def test_q22_idle_customers(spark, sf_dir, t):
    c = t["customer"]
    pos = c[c["c_acctbal"] > 0.0]
    avg = float(
        sum((_q(v, 2) for v in pos["c_acctbal"]), Decimal(0))
    ) / len(pos)
    active = set(
        t["orders"][t["orders"]["o_orderdate"] >= pd.Timestamp("1999-07-01")]
        ["o_custkey"]
    )
    hit = c[(c["c_acctbal"] > avg) & ~c["c_custkey"].isin(active)]
    expect = {}
    for nk, g in hit.groupby("c_nationkey"):
        expect[nk] = (
            len(g),
            _round(float(sum((_q(v, 2) for v in g["c_acctbal"]), Decimal(0))), 2),
        )
    got = {
        r["nationkey"]: (r["numcust"], r["totacctbal"])
        for r in QUERIES["q22_idle_customers"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect) and expect
    for k, (n, tb) in expect.items():
        assert got[k][0] == n
        _close(got[k][1], tb)
