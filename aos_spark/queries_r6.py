"""Round-6 gate queries: the exact set-similarity join and the data-layout
tier, promoted from unregistered modules to first-class gated operators
(ADVICE r5: ppjoin_pairs and ops/layout.py shipped with no gate entry, no
oracle, no test — determinism/completeness claims were unvalidated).

- **ppjoin_exact_pairs** — prefix-filtered EXACT Jaccard self-join
  (llm/setjoin.ppjoin_pairs): the lossless counterpart to MinHash-LSH.
  The oracle is the brute-force all-pairs shingle join with NO prefix
  filter — a hash match proves the prefix-filter lemma dropped nothing.
- **zorder_skipping_census** — Morton-interleave clustering key
  (ops/layout.zorder_key) + min-max data-skipping census
  (chunk_minmax_census): the same chunking expression run under a linear
  layout and a Z-order layout, one row each, showing Z-order shrinking
  the summed per-chunk min-max widths on the second dimension. All
  integer shift/mask arithmetic, mirrored literally by the oracle via
  zorder_key_sql.

Determinism contract as ever: BIGINT counts, single final double
divisions, rounding only in the output projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aos_spark.io.readers import read_sf_table
from aos_spark.llm.setjoin import ppjoin_pairs
from aos_spark.ops.layout import chunk_minmax_census, zorder_key, zorder_key_sql

R6_QUERIES: dict = {}
R6_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_sf_table(spark, sf_dir, name)


# ------------------------------------------------------------ ppjoin_exact_pairs
def q_ppjoin_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.5 document pairs via prefix filtering.
    The oracle below runs the UNFILTERED all-pairs shingle join, so a
    hash match is a completeness proof for the prefix-filter pruning
    (no pair at or above the threshold may be dropped)."""
    d = _t(spark, sf_dir, "documents")
    return ppjoin_pairs(d, "doc_id", "text", n=3, threshold=0.5)


# Brute force, no prefix filter: distinct 3-gram shingles per doc, full
# shingle equi-join, exact jaccard on the unrounded ratio (rounding only
# in the projection — mirrors the operator's fixed contract).
ORACLE_PPJOIN = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN list_transform(range(len(t) - 2), i -> array_to_string(t[i+1:i+3], ' '))
           ELSE [array_to_string(t, ' ')] END) AS shingles
  FROM (SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS t
        FROM documents)),
ex AS (SELECT doc_id AS id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b,
       ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
FROM inter
WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
"""


# -------------------------------------------------------- zorder_skipping_census
# Two layouts over the same (x, y) = (l_partkey % 64, l_suppkey % 64)
# point set, 16 chunks each: "linear" chunks by x alone (perfect x
# pruning, none on y), "zorder" chunks by the top 4 bits of the 12-bit
# Morton key (balanced pruning on both). The census reports the summed
# per-chunk min-max width per dimension — exactly the parquet footer
# stats a scan planner would consult.
_ZBITS = 6


def q_zorder_skipping_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.pmod(F.col("l_partkey"), F.lit(64)).alias("x"),
        F.pmod(F.col("l_suppkey"), F.lit(64)).alias("y"),
    )
    dims = {"x": F.col("x"), "y": F.col("y")}
    linear = chunk_minmax_census(
        pts, F.shiftright(F.col("x").cast("long"), 2), dims, "linear"
    )
    zorder = chunk_minmax_census(
        pts,
        F.shiftright(zorder_key(F.col("x"), F.col("y"), _ZBITS), 8),
        dims,
        "zorder",
    )
    return linear.unionByName(zorder)


def _zorder_census_oracle() -> str:
    zexpr = zorder_key_sql("x", "y", _ZBITS)
    return f"""
WITH pts AS (
  SELECT l_partkey % 64 AS x, l_suppkey % 64 AS y FROM lineitem),
lin AS (
  SELECT x >> 2 AS chunk, MAX(x) - MIN(x) + 1 AS w_x,
         MAX(y) - MIN(y) + 1 AS w_y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1),
zo AS (
  SELECT ({zexpr}) >> 8 AS chunk, MAX(x) - MIN(x) + 1 AS w_x,
         MAX(y) - MIN(y) + 1 AS w_y, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1)
SELECT 'linear' AS layout, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(SUM(w_x) AS BIGINT) AS sum_width_x,
       CAST(SUM(w_y) AS BIGINT) AS sum_width_y
FROM lin
UNION ALL
SELECT 'zorder', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT),
       CAST(SUM(w_x) AS BIGINT), CAST(SUM(w_y) AS BIGINT)
FROM zo
"""


R6_QUERIES.update(
    {
        "ppjoin_exact_pairs": q_ppjoin_exact_pairs,
        "zorder_skipping_census": q_zorder_skipping_census,
    }
)
R6_ORACLES.update(
    {
        "ppjoin_exact_pairs": ORACLE_PPJOIN,
        "zorder_skipping_census": _zorder_census_oracle(),
    }
)
