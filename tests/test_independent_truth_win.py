"""Independent-truth checks, wave 7: relational shapes (pivot/unpivot/
cube/rollup/histogram/rank/set-ops/skyline/JSON) and the window &
time-series family (DAU moving average, tumbling/overlapping windows,
burst detection, day-of-week anomaly, range frames, MoM growth, OLS
trend, lag-1 autocorrelation, CUSUM).

Same contract as waves 1–6: pandas/pure-Python recomputation with a
different technique — GROUPING-set cells enumerated by hand, window
frames as dict walks over explicit key ranges, the JSON column parsed
with Python's stdlib ``json`` (vs Spark's Jackson ``from_json`` and
DuckDB's ``->>``), and the repo's decimal moment idiom replayed with
``Decimal`` quantization step by step. Integers exact; engine-rounded
doubles within 1e-9.
"""

from __future__ import annotations

import json as pyjson
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


@pytest.fixture(scope="module")
def orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def nation_of_cust(sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nm = dict(zip(n["n_nationkey"], n["n_name"]))
    return {r.c_custkey: nm[r.c_nationkey] for r in c.itertuples()}


# ------------------------------------------------------ relational shapes


def test_pivot_status_revenue(spark, sf_dir, orders):
    acc: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in orders.itertuples():
        acc[(r.o_orderpriority, r.o_orderstatus)] += _q(r.o_totalprice, 2)
    expect = {
        pri: tuple(
            float(acc.get((pri, s), Decimal(0))) for s in ("F", "O", "P")
        )
        for pri in set(orders["o_orderpriority"])
    }
    got = {
        r["o_orderpriority"]: (r["rev_f"], r["rev_o"], r["rev_p"])
        for r in QUERIES["pivot_status_revenue"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        for g, e in zip(got[k], expect[k]):
            _close(g, e)


def test_unpivot_metrics(spark, sf_dir, lineitem):
    li = lineitem[lineitem["l_orderkey"] % 50 == 0]
    expect = {}
    for r in li.itertuples():
        for metric, v in (
            ("l_quantity", r.l_quantity),
            ("l_extendedprice", r.l_extendedprice),
            ("l_discount", r.l_discount),
        ):
            expect[(r.l_orderkey, r.l_linenumber, metric)] = v
    got = {
        (r["l_orderkey"], r["l_linenumber"], r["metric"]): r["value"]
        for r in QUERIES["unpivot_metrics"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_cube_order_stats(spark, sf_dir, orders):
    expect = {}

    def add(pri, status, sub, gid):
        acc = Decimal(0)
        n = 0
        for r in sub.itertuples():
            acc += _q(r.o_totalprice, 2)
            n += 1
        expect[(pri, status, gid)] = (n, float(acc))

    for (p, s), g in orders.groupby(["o_orderpriority", "o_orderstatus"]):
        add(p, s, g, 0)
    for p, g in orders.groupby("o_orderpriority"):
        add(p, None, g, 1)
    for s, g in orders.groupby("o_orderstatus"):
        add(None, s, g, 2)
    add(None, None, orders, 3)
    got = {
        (r["o_orderpriority"], r["o_orderstatus"], r["gid"]):
            (r["n_orders"], r["revenue"])
        for r in QUERIES["cube_order_stats"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, rev) in expect.items():
        assert got[k][0] == n, k
        _close(got[k][1], rev)


def test_rollup_time_hierarchy(spark, sf_dir, orders):
    ym = [(d.year, d.month, tp) for d, tp in
          zip(orders["o_orderdate"], orders["o_totalprice"])]
    expect = {}

    def add(key, rows, gid):
        acc = sum((_q(tp, 2) for _, _, tp in rows), Decimal(0))
        expect[(*key, gid)] = (len(rows), _round(float(acc), 2))

    by_ym: dict[tuple, list] = defaultdict(list)
    for y, m, tp in ym:
        by_ym[(y, m)].append((y, m, tp))
    for (y, m), rows in by_ym.items():
        add((y, m), rows, 0)
    by_y: dict[int, list] = defaultdict(list)
    for y, m, tp in ym:
        by_y[y].append((y, m, tp))
    for y, rows in by_y.items():
        add((y, None), rows, 1)
    add((None, None), ym, 3)
    got = {
        (r["o_year"], r["o_month"], r["gid"]): (r["n_orders"], r["total_price"])
        for r in QUERIES["rollup_time_hierarchy"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, tp) in expect.items():
        assert got[k][0] == n, k
        _close(got[k][1], tp)


def test_histogram_quantity(spark, sf_dir, lineitem):
    acc: dict[int, list] = defaultdict(lambda: [0, Decimal(0)])
    for r in lineitem.itertuples():
        b = math.floor(r.l_quantity / 5.0)
        acc[b][0] += 1
        acc[b][1] += _q(r.l_extendedprice, 2)
    got = {
        r["bucket"]: (r["n_items"], r["bucket_revenue"], r["lo"], r["hi"])
        for r in QUERIES["histogram_quantity"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc)
    for b, (n, rev) in acc.items():
        assert got[b][0] == n and got[b][2] == b * 5.0 and got[b][3] == (b + 1) * 5.0
        _close(got[b][1], float(rev))


def test_rank_distribution(spark, sf_dir, orders):
    expect = {}
    for pri, g in orders.groupby("o_orderpriority"):
        rows = sorted(zip(g["o_totalprice"], g["o_orderkey"]))
        n = len(rows)
        base, extra = divmod(n, 4)
        bounds = []
        pos = 0
        for tile in range(1, 5):
            size = base + (1 if tile <= extra else 0)
            bounds.extend([tile] * size)
            pos += size
        for i, (_tp, ok) in enumerate(rows):
            expect[(pri, ok)] = (
                bounds[i],
                (i / (n - 1)) if n > 1 else 0.0,
                (i + 1) / n,
            )
    got = {
        (r["o_orderpriority"], r["o_orderkey"]):
            (r["quartile"], r["pct_rank"], r["cume"])
        for r in QUERIES["rank_distribution"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (qt, pr, cu) in expect.items():
        assert got[k][0] == qt, k
        _close(got[k][1], pr, rel=1e-12, abs_=1e-12)
        _close(got[k][2], cu, rel=1e-12, abs_=1e-12)


def test_above_nation_avg_customers(spark, sf_dir, orders, nation_of_cust):
    per_cust = Counter(orders["o_custkey"])
    by_nation: dict[str, list] = defaultdict(list)
    for ck, nat in nation_of_cust.items():
        by_nation[nat].append(per_cust.get(ck, 0))
    expect = {}
    for nat, cnts in by_nation.items():
        n_cust, total = len(cnts), sum(cnts)
        expect[nat] = (
            n_cust, total,
            sum(1 for c in cnts if c * n_cust > 2 * total),
        )
    got = {
        r["nation"]: (r["n_customers"], r["total_orders"], r["n_above"])
        for r in QUERIES["above_nation_avg_customers"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_customer_skyline_frontier(spark, sf_dir, orders, nation_of_cust):
    per: dict[tuple, list] = defaultdict(lambda: [Decimal(0), 0])
    for r in orders.itertuples():
        key = (nation_of_cust[r.o_custkey], r.o_custkey)
        per[key][0] += _q(r.o_totalprice, 2)
        per[key][1] += 1
    expect = {}
    by_nation: dict[str, list] = defaultdict(list)
    for (nat, ck), (spend, n) in per.items():
        by_nation[nat].append((spend, ck, n))
    for nat, rows in by_nation.items():
        grp_max: dict[Decimal, int] = {}
        for spend, _ck, n in rows:
            grp_max[spend] = max(grp_max.get(spend, 0), n)
        run_max: dict[Decimal, int | None] = {}
        best = None
        for spend in sorted(grp_max, reverse=True):
            run_max[spend] = best
            best = grp_max[spend] if best is None else max(best, grp_max[spend])
        for spend, ck, n in rows:
            rm = run_max[spend]
            if rm is None or rm <= n:
                expect[(nat, ck)] = (float(spend), n)
    got = {
        (r["nation"], r["custkey"]): (r["total_spend"], r["n_orders"])
        for r in QUERIES["customer_skyline_frontier"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_bag_difference_except_all(spark, sf_dir, lineitem):
    c97 = Counter(
        lineitem.loc[lineitem["l_shipdate"].dt.year == 1997, "l_suppkey"]
    )
    c98 = Counter(
        lineitem.loc[lineitem["l_shipdate"].dt.year == 1998, "l_suppkey"]
    )
    expect = {
        sk: c97[sk] - c98.get(sk, 0)
        for sk in c97 if c97[sk] - c98.get(sk, 0) > 0
    }
    got = {
        r["l_suppkey"]: r["surplus_shipments"]
        for r in QUERIES["bag_difference_except_all"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_set_ops_segments(spark, sf_dir, orders):
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_custkey"])
    fstat = set(orders.loc[orders["o_orderstatus"] == "F", "o_custkey"])
    expect = {(ck, "both") for ck in urgent & fstat} | {
        (ck, "urgent_only") for ck in urgent - fstat
    }
    got = {
        (r["o_custkey"], r["segment"])
        for r in QUERIES["set_ops_segments"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_json_props_stats(spark, sf_dir, events):
    ks: dict[str, list] = defaultdict(list)
    for r in events.itertuples():
        k = None
        if r.props:
            k = pyjson.loads(r.props).get("k")
        if k is not None:
            ks[r.event_type].append(int(k))
    expect = {
        t: (len(v), sum(v), len(set(v)), min(v), max(v))
        for t, v in ks.items()
    }
    got = {
        r["event_type"]: (r["n"], r["sum_k"], r["n_distinct_k"],
                          r["min_k"], r["max_k"])
        for r in QUERIES["json_props_stats"](spark, sf_dir).collect()
    }
    assert got == expect and expect


# --------------------------------------------------- windows / time series


def test_dau_moving_average(spark, sf_dir, events):
    users: dict[pd.Timestamp, set] = defaultdict(set)
    for r in events.itertuples():
        users[r.ts.floor("D")].add(r.user_id)
    days = sorted(users)
    expect = {}
    by_year: dict[int, list] = defaultdict(list)
    for d in days:
        by_year[d.year].append(d)
    for year, ds in by_year.items():
        for i, d in enumerate(ds):
            win = ds[max(0, i - 6) : i + 1]
            s = sum(len(users[x]) for x in win)
            expect[d.to_pydatetime()] = (
                len(users[d]), _round(float(s) / len(win), 6)
            )
    got = {
        r["day"]: (r["dau"], r["dau_7d_avg"])
        for r in QUERIES["dau_moving_average"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (dau, avg) in expect.items():
        assert got[k][0] == dau, k
        _close(got[k][1], avg)


def test_tumbling_event_windows(spark, sf_dir, events):
    acc: dict[tuple, list] = defaultdict(lambda: [0, Decimal(0)])
    for r in events.itertuples():
        key = (r.ts.floor("h").to_pydatetime(), r.event_type)
        acc[key][0] += 1
        acc[key][1] += _q(r.value, 6)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in QUERIES["tumbling_event_windows"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc)
    for k, (n, s) in acc.items():
        assert got[k][0] == n, k
        _close(got[k][1], float(s), rel=1e-12)


def test_overlapping_order_windows(spark, sf_dir, orders):
    epoch = pd.Timestamp("1990-01-01")
    by_cust: dict[int, list] = defaultdict(list)
    for r in orders.itertuples():
        d0 = float((r.o_orderdate - epoch).days)
        by_cust[r.o_custkey].append((r.o_orderkey, d0, d0 + 7.0))
    expect = {}
    for ck, rows in by_cust.items():
        n = 0
        rows.sort()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][1] < rows[j][2] and rows[j][1] < rows[i][2]:
                    n += 1
        if n:
            expect[ck] = n
    got = {
        r["o_custkey"]: r["n_overlapping_pairs"]
        for r in QUERIES["overlapping_order_windows"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_user_burst_hours(spark, sf_dir, events):
    hourly: dict[int, Counter] = defaultdict(Counter)
    for r in events.itertuples():
        hourly[r.user_id][(r.ts.value // 1000) // 3_600_000_000] += 1
    expect = {}
    for user, hrs in hourly.items():
        bursts = 0
        for h, n in hrs.items():
            trail = [hrs[x] for x in (h - 3, h - 2, h - 1) if x in hrs]
            if trail and n * len(trail) >= 2 * sum(trail):
                bursts += 1
        expect[user] = (
            len(hrs), bursts, max(hrs.values()), sum(hrs.values())
        )
    got = {
        r["user_id"]: (r["n_active_hours"], r["n_burst_hours"],
                       r["peak_hourly"], r["total_events"])
        for r in QUERIES["user_burst_hours"](spark, sf_dir).collect()
    }
    assert got == expect and expect


def test_seasonal_dow_anomaly(spark, sf_dir, events):
    daily = Counter(d.date() for d in events["ts"])
    anchor = pd.Timestamp("1992-01-06").date()
    dow_tot: Counter = Counter()
    dow_days: Counter = Counter()
    for day, cnt in daily.items():
        dow = ((day - anchor).days % 7 + 7) % 7
        dow_tot[dow] += cnt
        dow_days[dow] += 1
    expect = {}
    for day, cnt in daily.items():
        dow = ((day - anchor).days % 7 + 7) % 7
        expect[day.strftime("%Y-%m-%d")] = (
            dow, cnt,
            _round(float(cnt * dow_days[dow]) / float(dow_tot[dow]), 6),
            cnt * dow_days[dow] * 100 > 105 * dow_tot[dow],
        )
    got = {
        r["day"]: (r["dow"], r["cnt"], r["ratio_to_dow_avg"], r["is_anomaly"])
        for r in QUERIES["seasonal_dow_anomaly"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (dow, cnt, ratio, anom) in expect.items():
        assert got[k][0] == dow and got[k][1] == cnt and got[k][3] == anom, k
        _close(got[k][2], ratio)


def test_range_frame_window_spend(spark, sf_dir, orders):
    by_cust: dict[int, list] = defaultdict(list)
    for r in orders.itertuples():
        by_cust[r.o_custkey].append((r.o_orderdate.date(), r.o_orderkey,
                                     _q(r.o_totalprice, 2)))
    expect = {}
    for ck, rows in by_cust.items():
        for day, ok, _tp in rows:
            s = sum(
                (tp2 for d2, _ok2, tp2 in rows
                 if 0 <= (day - d2).days <= 6),
                Decimal(0),
            )
            expect[(ck, day, ok)] = _round(float(s), 2)
    got = {
        (r["o_custkey"], r["o_day"], r["o_orderkey"]): r["spend_7d"]
        for r in QUERIES["range_frame_window_spend"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        _close(got[k], expect[k])


def test_monthly_growth_by_nation(spark, sf_dir, orders, nation_of_cust):
    acc: dict[tuple, Decimal] = defaultdict(Decimal)
    for r in orders.itertuples():
        month = r.o_orderdate.to_period("M").to_timestamp()
        acc[(nation_of_cust[r.o_custkey], month)] += _q(r.o_totalprice, 2)
    by_nation: dict[str, list] = defaultdict(list)
    for (nat, month), v in acc.items():
        by_nation[nat].append((month, float(v)))
    expect = {}
    for nat, rows in by_nation.items():
        rows.sort()
        prev = None
        for month, rev in rows:
            growth = (
                _round((rev - prev) / prev, 6) if prev is not None else None
            )
            expect[(nat, month.to_pydatetime())] = (rev, prev, growth)
            prev = rev
    got = {
        (r["nation"], r["month"]):
            (r["revenue"], r["prev_revenue"], r["mom_growth"])
        for r in QUERIES["monthly_growth_by_nation"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (rev, prev, growth) in expect.items():
        _close(got[k][0], rev)
        if prev is None:
            assert got[k][1] is None and got[k][2] is None, k
        else:
            _close(got[k][1], prev)
            _close(got[k][2], growth)


def _moment_sums(pairs):
    """The repo's decimal moment idiom: per-term quantization at the
    documented scales, exact Decimal sums, repr-rounded double casts."""
    q6 = Decimal(1).scaleb(-6)
    sum_x = sum((_q(x, 6) for x, _ in pairs), Decimal(0))
    sum_y = sum((_q(y, 6) for _, y in pairs), Decimal(0))
    sum_xy = sum(
        (_q(x, 6) * _q(y, 6) for x, y in pairs), Decimal(0)
    )
    sum_xx = sum((_q(x, 6) * _q(x, 6) for x, _ in pairs), Decimal(0))
    sum_yy = sum((_q(y, 6) * _q(y, 6) for _, y in pairs), Decimal(0))
    del q6
    return (
        len(pairs),
        _round(float(sum_x), 2), _round(float(sum_y), 2),
        _round(float(sum_xy), 0), _round(float(sum_xx), 0),
        _round(float(sum_yy), 0),
    )


def test_revenue_trend_by_nation(spark, sf_dir, orders, nation_of_cust):
    daily: dict[tuple, list] = defaultdict(lambda: [Decimal(0), 0])
    epoch = pd.Timestamp("1995-01-01").date()
    for r in orders.itertuples():
        key = (nation_of_cust[r.o_custkey],
               float((r.o_orderdate.date() - epoch).days))
        daily[key][0] += _q(r.o_totalprice, 2)
        daily[key][1] += 1
    by_nation: dict[str, list] = defaultdict(list)
    for (nat, x), (s, c) in daily.items():
        by_nation[nat].append((x, float(s) / float(c)))
    expect = {}
    for nat, pairs in by_nation.items():
        n, sum_x, sum_y, sum_xy, sum_xx, sum_yy = _moment_sums(pairs)
        slope = intercept = rr = None
        if n >= 2:
            var_x = (sum_xx - sum_x * sum_x / n) / (n - 1)
            if var_x > 0:
                cov = (sum_xy - sum_x * sum_y / n) / (n - 1)
                slope = _round(cov / var_x, 6)
                intercept = _round((sum_y - (cov / var_x) * sum_x) / n, 6)
                var_y = (sum_yy - sum_y * sum_y / n) / (n - 1)
                if var_y > 0:
                    rr = _round(cov / math.sqrt(var_x * var_y), 6)
        expect[nat] = (n, slope, intercept, rr)
    got = {
        r["nation"]: (r["n"], r["slope"], r["intercept"], r["r"])
        for r in QUERIES["revenue_trend_by_nation"](spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, slope, intercept, rr) in expect.items():
        assert got[k][0] == n, k
        for g, e in zip(got[k][1:], (slope, intercept, rr)):
            if e is None:
                assert g is None, k
            else:
                _close(g, e)


def test_order_autocorrelation(spark, sf_dir, orders):
    daily: dict[tuple, list] = defaultdict(lambda: [Decimal(0), 0])
    for r in orders.itertuples():
        key = (r.o_orderdate.year, r.o_orderdate.floor("D"))
        daily[key][0] += _q(r.o_totalprice, 2)
        daily[key][1] += 1
    series: dict[int, list] = defaultdict(list)
    for (yr, day), (s, c) in daily.items():
        m = int(s * 1_000_000) // c  # exact scaled floor division (HUGEINT //)
        series[yr].append((day, Decimal(m) * Decimal("0.000001")))
    got = {
        r["yr"]: r.asDict()
        for r in QUERIES["order_autocorrelation"](spark, sf_dir).collect()
    }
    assert set(got) == set(series)
    for yr, rows in series.items():
        rows.sort()
        pairs = [
            (float(rows[i][1]), float(rows[i - 1][1]))
            for i in range(1, len(rows))
        ]
        n, sum_x, sum_y, sum_xy, sum_xx, sum_yy = _moment_sums(pairs)
        r = got[yr]
        assert r["n"] == n, yr
        for col, e in (("sum_x", sum_x), ("sum_y", sum_y), ("sum_xy", sum_xy),
                       ("sum_xx", sum_xx), ("sum_yy", sum_yy)):
            _close(r[col], e)
        if n >= 2:
            cov = (sum_xy - sum_x * sum_y / n) / (n - 1)
            _close(r["covar_xy"], _round(cov, 6))
            var_x = (sum_xx - sum_x * sum_x / n) / (n - 1)
            var_y = (sum_yy - sum_y * sum_y / n) / (n - 1)
            if var_x >= 0:
                _close(r["stddev_x"], _round(math.sqrt(var_x), 6))
            if var_x > 0 and var_y > 0:
                _close(
                    r["corr_xy"],
                    _round(cov / math.sqrt(var_x * var_y), 6),
                )


def test_cusum_change_point(spark, sf_dir, orders):
    daily = Counter(orders["o_orderdate"])
    days = sorted(daily)
    n_days, n_orders = len(days), sum(daily.values())
    cum, best = 0, None
    for day in days:
        cum += daily[day] * n_days - n_orders
        if best is None or abs(cum) > abs(best[1]):
            best = (day, cum)
    got = QUERIES["cusum_change_point"](spark, sf_dir).collect()[0]
    assert (got["n_days"], got["n_orders"]) == (n_days, n_orders)
    assert got["cp_date"] == best[0].strftime("%Y-%m-%d")
    assert got["peak_cusum_scaled"] == best[1]
    _close(got["peak_deviation_orders"],
           _round(float(best[1]) / float(n_days), 4))
