"""Operator library — SURVEY.md §2 re-expressed as composable DataFrame
transforms. Every function takes and returns DataFrames and stays inside
Catalyst-optimizable expressions (no Python row loops, no collect)."""

from aos_spark.ops import (  # noqa: F401
    cci,
    filters,
    probability,
    rollup,
    sequences,
    severity,
    topk,
    vulnerability,
    windows,
)
