"""Tracked persist() for operators whose internal frames feed multiple
sides of the RETURNED lazy plan (self-join candidate frames, top-k
survivors). The persist is load-bearing — Spark's exchange/cache reuse
does not fire across aliased self-join sides — but the operator cannot
unpersist before the caller executes the plan, so naive ``.persist()``
leaks cache entries for the life of the session (CacheManager holds
them until an explicit unpersist/clearCache; they are NOT released when
the Python DataFrame is garbage-collected).

Contract: operators call :func:`persist_tracked`; batch drivers
(bench.py, scripts/check_oracle.py, pipeline jobs) call
:func:`release_tracked` after materializing each query's results. At
100 TB this is the difference between bounded executor storage memory
and an ever-growing cache evicting useful blocks mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for later bulk release."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = len(_LIVE)
    while _LIVE:
        _LIVE.pop().unpersist()
    return n
