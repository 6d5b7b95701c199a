"""Property tests: the scalable join formulations (as-of union-and-carry,
bucketized range join) must agree with naive per-row reference
implementations on randomized inputs."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from aos_spark.ops.asof import asof_join
from aos_spark.ops.intervals import bucketized_range_join

_BASE = datetime(2024, 1, 1)

_pairs = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 48)), min_size=1, max_size=12
)


def _spark():
    from aos_spark.session import get_spark

    return get_spark("aos-tests", master="local[4]", shuffle_partitions=4)


@settings(max_examples=12, deadline=None)
@given(left=_pairs, right=_pairs)
def test_asof_matches_naive(left, right):
    spark = _spark()
    lrows = [
        (i, key, _BASE + timedelta(hours=h)) for i, (key, h) in enumerate(left)
    ]
    # right side must be unique per (key, ts): dedupe keeping max value
    rmap = {}
    for i, (key, h) in enumerate(right):
        ts = _BASE + timedelta(hours=h)
        rmap[(key, ts)] = max(rmap.get((key, ts), float("-inf")), float(i))
    rrows = [(k, ts, v) for (k, ts), v in rmap.items()]
    ldf = spark.createDataFrame(lrows, ["event_id", "user_id", "ts"])
    rdf = spark.createDataFrame(rrows, ["user_id", "ts", "signal"])
    got = {
        r["event_id"]: r["signal"]
        for r in asof_join(ldf, rdf, value_cols=["signal"]).collect()
    }
    for event_id, key, ts in lrows:
        cands = [(rts, v) for (rk, rts), v in rmap.items() if rk == key and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[event_id] == want, (event_id, key, ts)


@settings(max_examples=12, deadline=None)
@given(
    points=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1, max_size=15),
    ivs=st.lists(
        st.tuples(st.floats(-50, 50, allow_nan=False), st.floats(0, 30, allow_nan=False)),
        min_size=1,
        max_size=8,
    ),
    width=st.sampled_from([0.7, 3.0, 11.0, 100.0]),
)
def test_range_join_matches_naive(points, ivs, width):
    spark = _spark()
    pdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(points)], ["pid", "value"]
    )
    idf = spark.createDataFrame(
        [(j, float(lo), float(lo + span)) for j, (lo, span) in enumerate(ivs)],
        ["iv", "lo", "hi"],
    )
    got = sorted(
        (r["pid"], r["iv"])
        for r in bucketized_range_join(pdf, idf, "value", "lo", "hi", width).collect()
    )
    want = sorted(
        (i, j)
        for i, v in enumerate(points)
        for j, (lo, span) in enumerate(ivs)
        if lo <= v <= lo + span
    )
    assert got == want
