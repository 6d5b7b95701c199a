"""Property tests for the round-5 second-wave operators: randomized
event sequences checked against naive Python references for the Markov
transition matrix, burst detection, and the postings index."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from hypothesis import given, settings, strategies as st

from aos_spark.llm.text import postings_index
from aos_spark.ops.sequences import burst_hours, transition_matrix

_STATES = ["a", "b", "c"]

# (user, minute-offset, state) triples; minute offsets may collide, the
# event_id tiebreak disambiguates
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=600),
        st.sampled_from(_STATES),
    ),
    min_size=1,
    max_size=60,
)


def _spark():
    from aos_spark.session import get_spark

    return get_spark("aos-tests", master="local[4]", shuffle_partitions=4)


def _frame(spark, events):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (eid, base + dt.timedelta(minutes=m), u, s)
        for eid, (u, m, s) in enumerate(events)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])


@settings(max_examples=10, deadline=None)
@given(events=_events)
def test_transition_matrix_matches_naive(events):
    spark = _spark()
    got = {
        (r["prev_state"], r["next_state"]): r["n_transitions"]
        for r in transition_matrix(
            _frame(spark, events), "user_id", "event_type", ["ts", "event_id"]
        ).collect()
    }
    seqs = defaultdict(list)
    for eid, (u, m, s) in enumerate(events):
        seqs[u].append((m, eid, s))
    ref: Counter = Counter()
    for u, evs in seqs.items():
        evs.sort()
        for (_, _, p), (_, _, n) in zip(evs, evs[1:]):
            ref[(p, n)] += 1
    assert got == dict(ref)


@settings(max_examples=10, deadline=None)
@given(events=_events)
def test_burst_hours_matches_naive(events):
    spark = _spark()
    got = {
        r["user_id"]: (r["n_active_hours"], r["n_burst_hours"], r["peak_hourly"])
        for r in burst_hours(
            _frame(spark, events), "user_id", "ts", lookback_hours=3, factor=2
        ).collect()
    }
    per_user_hour: Counter = Counter()
    base_hour = dt.datetime(2024, 1, 1).timestamp() // 3600
    for u, m, _ in events:
        per_user_hour[(u, int(base_hour) + m // 60)] += 1
    ref = {}
    by_user = defaultdict(dict)
    for (u, h), n in per_user_hour.items():
        by_user[u][h] = n
    for u, hours in by_user.items():
        bursts = 0
        for h, n in hours.items():
            trail = [hours[t] for t in range(h - 3, h) if t in hours]
            if trail and n * len(trail) >= 2 * sum(trail):
                bursts += 1
        ref[u] = (len(hours), bursts, max(hours.values()))
    assert got == ref


_texts = st.lists(
    st.lists(st.sampled_from(["x", "y", "z", "w0"]), min_size=0, max_size=12),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None)
@given(docs=_texts, cap=st.sampled_from([1, 3, 20]))
def test_postings_index_matches_naive(docs, cap):
    spark = _spark()
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["term"]: (r["df"], r["tf_total"], r["postings"])
        for r in postings_index(df, min_df=1, max_postings=cap).collect()
    }
    tf: Counter = Counter()
    by_term = defaultdict(set)
    for i, toks in enumerate(docs):
        for t in toks:
            tf[t] += 1
            by_term[t].add(i)
    ref = {
        t: (
            len(ds),
            tf[t],
            ",".join(str(d) for d in sorted(ds)[:cap]),
        )
        for t, ds in by_term.items()
    }
    assert got == ref


_vals = st.lists(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
    min_size=2,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(vals=_vals, k=st.sampled_from([1.5, 3.0]))
def test_mad_outliers_matches_statistics_reference(vals, k):
    import statistics

    from aos_spark.ops.stats import mad_outliers

    spark = _spark()
    vals = [float(v) for v in vals]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], ["grp", "id", "v"]
    )
    row = mad_outliers(df, ["grp"], "v", ["id"], k=k).collect()[0]
    med = statistics.median(vals)
    devs = [abs(v - med) for v in vals]
    mad = statistics.median(devs)
    n_out = sum(1 for d in devs if d > k * mad)
    assert row["n_rows"] == len(vals)
    assert abs(row["median"] - med) < 1e-6
    assert abs(row["mad"] - mad) < 1e-6
    assert row["n_outliers"] == n_out
