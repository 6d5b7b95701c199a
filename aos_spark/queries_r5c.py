"""Round-5 fourth wave gate queries.

Gaps-and-islands / concentration / diversity / basket-mining analytics:

- **interval_union_coverage** — per-user union of overlapping fixed-length
  event intervals (the classic merge-intervals sweep, ops/intervals
  .merge_intervals): ONE user-keyed shuffle carries both windows and the
  island rollup. All arithmetic in BIGINT epoch seconds.
- **gini_revenue_by_nation** — exact-rank Gini concentration of customer
  revenue within each nation (ops/stats.grouped_gini): decimal moments,
  one final IEEE division.
- **simpson_diversity_by_source** — language diversity per corpus source
  as Simpson's index 1 − Σc²/n², rational on exact counts (no ln —
  the cross-libm rule).
- **assoc_rules_brands** — market-basket association rules over per-order
  brand baskets (ops/assoc.association_rules): support/confidence/lift
  with an integer cross-multiplied support cut.

Determinism follows the repo contract: BIGINT counts, exact decimal
moments, single-division floats whose operand order the oracle mirrors
literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aos_spark.io.readers import read_sf_table

R5C_QUERIES: dict = {}
R5C_ORACLES: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_sf_table(spark, sf_dir, name)


def q_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event opens a 1-hour activity interval; overlapping/touching
    intervals union into islands per user. Output: per-user island count,
    total covered seconds, and the densest island's event count — the
    'effective active time' metric sessionization approximates from the
    other direction."""
    from aos_spark.ops.intervals import merge_intervals

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("ivl_start"),
        (F.unix_timestamp("ts") + F.lit(3600)).alias("ivl_end"),
    )
    islands = merge_intervals(iv, ["user_id"], "ivl_start", "ivl_end")
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias(
            "covered_seconds"
        ),
        F.max("n_intervals").alias("max_island_events"),
    )


ORACLE_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
         CAST(FLOOR(epoch(ts)) AS BIGINT) + 3600 AS e
  FROM events),
m AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM iv),
g AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m),
isl AS (
  SELECT user_id, island,
         MIN(s) AS island_start, MAX(e) AS island_end,
         COUNT(*) AS n_intervals
  FROM g GROUP BY 1, 2)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(island_end - island_start) AS BIGINT) AS covered_seconds,
       CAST(MAX(n_intervals) AS BIGINT) AS max_island_events
FROM isl GROUP BY user_id
"""


def q_gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation: exact decimal rank moments over
    per-customer order totals. Shuffles: custkey rollup → nation-keyed
    rank window (grouped_gini reuses that exchange for its rollup);
    customer joins on its own key, nation broadcasts."""
    from aos_spark.ops.stats import grouped_gini

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust_rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(14,2)")
            .alias("rev")
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "o_custkey", "rev")
    )
    g = grouped_gini(cust_rev, ["nation"], "rev", order_cols=["o_custkey"])
    return g.select(
        "nation",
        F.col("n").alias("n_customers"),
        F.round("total_value", 2).alias("total_rev"),
        "gini",
    )


ORACLE_GINI = """
WITH cust_rev AS (
  SELECT n_name AS nation, o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(14,2)) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
ranked AS (
  SELECT nation, rev,
         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY rev, o_custkey) AS i
  FROM cust_rev),
m AS (
  SELECT nation,
         COUNT(*) AS n,
         SUM(rev) AS s,
         SUM(CAST(i AS DECIMAL(20,0)) * rev) AS s1
  FROM ranked GROUP BY nation)
SELECT nation,
       CAST(n AS BIGINT) AS n_customers,
       ROUND(CAST(s AS DOUBLE), 2) AS total_rev,
       ROUND((2.0 * CAST(s1 AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
FROM m
"""


def q_simpson_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language diversity per corpus source: Simpson's index
    1 − Σc²/n² on exact counts — a rational diversity measure (Shannon
    entropy needs ln(), which diverges across libm implementations; the
    tf-idf/key-skew precedent). One (source, lang) rollup, then a
    source-sized re-aggregate: two map-combined shuffles, output
    |sources| rows."""
    d = _t(spark, sf_dir, "documents")
    by_lang = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    c18 = F.col("c").cast("decimal(18,0)")
    agg = by_lang.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.sum(c18 * c18).alias("sum_c2"),
    )
    n18 = F.col("n_docs").cast("decimal(18,0)")
    return agg.select(
        "source",
        "n_docs",
        "n_langs",
        F.round(
            F.lit(1.0)
            - F.col("sum_c2").cast("double") / (n18 * n18).cast("double"),
            6,
        ).alias("simpson_diversity"),
    )


ORACLE_SIMPSON = """
WITH by_lang AS (
  SELECT source, lang, COUNT(*) AS c
  FROM documents GROUP BY 1, 2),
agg AS (
  SELECT source,
         SUM(c) AS n_docs,
         COUNT(*) AS n_langs,
         SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) AS sum_c2
  FROM by_lang GROUP BY source)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_langs AS BIGINT) AS n_langs,
       ROUND(1.0 - CAST(sum_c2 AS DOUBLE)
                   / CAST(CAST(n_docs AS DECIMAL(18,0)) * CAST(n_docs AS DECIMAL(18,0)) AS DOUBLE),
             6) AS simpson_diversity
FROM agg
"""


def q_assoc_rules_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over per-order brand baskets: which part brands
    are bought together more often than independence predicts. Brand dim
    broadcasts onto lineitem; the pair self-join is order-keyed
    (fan-out ≤ brands-per-order², never corpus²); support cut at 1% of
    baskets via integer cross-multiply."""
    from aos_spark.ops.assoc import association_rules

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return association_rules(
        baskets, "l_orderkey", "p_brand", min_support_pct=1
    )


ORACLE_ASSOC = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey),
tot AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM ob),
item_n AS (SELECT item, COUNT(*) AS item_n FROM ob GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_n
  FROM ob a JOIN ob b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2),
directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, pair_n FROM pairs
  UNION ALL
  SELECT item_b AS antecedent, item_a AS consequent, pair_n FROM pairs)
SELECT d.antecedent, d.consequent,
       CAST(d.pair_n AS BIGINT) AS pair_n,
       CAST(ia.item_n AS BIGINT) AS ant_n,
       CAST(ic.item_n AS BIGINT) AS con_n,
       CAST(t.n_baskets AS BIGINT) AS n_baskets,
       ROUND(CAST(d.pair_n AS DOUBLE) / CAST(t.n_baskets AS DOUBLE), 6) AS support,
       ROUND(CAST(d.pair_n AS DOUBLE) / CAST(ia.item_n AS DOUBLE), 6) AS confidence,
       ROUND(CAST(d.pair_n * t.n_baskets AS DOUBLE)
             / CAST(ia.item_n * ic.item_n AS DOUBLE), 6) AS lift
FROM directed d
JOIN item_n ia ON d.antecedent = ia.item
JOIN item_n ic ON d.consequent = ic.item
CROSS JOIN tot t
WHERE d.pair_n * 100 >= 1 * t.n_baskets
"""


R5C_QUERIES.update(
    {
        "interval_union_coverage": q_interval_union_coverage,
        "gini_revenue_by_nation": q_gini_revenue_by_nation,
        "simpson_diversity_by_source": q_simpson_diversity_by_source,
        "assoc_rules_brands": q_assoc_rules_brands,
    }
)
R5C_ORACLES.update(
    {
        "interval_union_coverage": ORACLE_INTERVAL_COVERAGE,
        "gini_revenue_by_nation": ORACLE_GINI,
        "simpson_diversity_by_source": ORACLE_SIMPSON,
        "assoc_rules_brands": ORACLE_ASSOC,
    }
)
