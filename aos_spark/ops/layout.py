"""Data-layout operators: Z-order (Morton) clustering keys and
data-skipping effectiveness measurement.

At 100 TB the scan cost of a selective query is decided before it runs,
by LAYOUT: parquet row-group / file min-max stats can prune chunks only
if the written order co-locates similar values. Sorting by one column
gives perfect pruning on that column and none on any other; interleaving
the bits of two (or more) columns — the Z-order / Morton curve used by
Delta OPTIMIZE ZORDER BY and Databricks clustering — buys good pruning
on BOTH at a small cost to each.

Everything here is integer arithmetic in plain Catalyst expressions
(shift + mask + sum), so it runs inside whole-stage codegen and is
bit-for-bit reproducible by any SQL oracle. Chunk assignment is a pure
projection (top bits of the key), NOT a global sort: at cluster scale
the same expression becomes the repartitionByRange / write-partition
key, and the min-max census below is exactly the parquet footer stats
the scan planner would consult.

The reference engine has no layout tier (its Snowflake tables rely on
micro-partition clustering implicitly); this is part of the
scale-pipeline tier the build brief adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1. The
    result is a (2*bits)-bit BIGINT; sorting / range-chunking by it walks
    the Z-curve through (x, y) space.

    Spelled with >> and & so a SQL oracle mirrors it literally:
    sum_i ((x >> i) & 1) << 2i  +  ((y >> i) & 1) << (2i+1).

    Inputs are cast to long up front: Java shifts are mod-32 on ints, so
    an IntegerType input with bits > 15 would silently wrap (shift 32 ==
    shift 0) and corrupt the key. On longs every shift here (< 2*bits <=
    some sane <= 31*2) is well-defined up to 63.
    """
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    x = x.cast("long")
    y = y.cast("long")
    terms: list[Column] = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB/ANSI mirror of zorder_key — same shift/mask/sum tree."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def chunk_minmax_census(
    df: DataFrame,
    chunk: Column,
    dims: dict[str, Column],
    layout: str,
) -> DataFrame:
    """Per-layout skipping census: assign every row to a chunk (a pure
    projection — at write time this is the file/partition id), then for
    each dimension report the summed min-max WIDTH across chunks:
    sum_c (max_d - min_d + 1). A point predicate on dimension d touches a
    chunk iff its value falls inside the chunk's [min, max], so summed
    width / (n_chunks * domain) is exactly the expected fraction of
    chunks scanned under a uniform point query — smaller = better
    skipping. One map-side-combined aggregation; output is one row per
    layout, integer columns only."""
    per_chunk = df.select(
        chunk.alias("chunk"), *[c.alias(k) for k, c in dims.items()]
    ).groupBy("chunk")
    aggs = []
    for k in dims:
        aggs.append((F.max(k) - F.min(k) + F.lit(1)).alias(f"w_{k}"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    chunks = per_chunk.agg(*aggs)
    return chunks.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_rows").alias("n_rows"),
        *[F.sum(f"w_{k}").cast("long").alias(f"sum_width_{k}") for k in dims],
    )
