"""Round-4 LLM-pipeline additions: composite corpus filtering, vocabulary
construction, and distributed k-means — the curation steps between raw
crawl and training shards that the dedup/similarity/packing tiers assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aos_spark.io.readers import read_sf_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_sf_table(spark, sf_dir, name)


def q_corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style keep/drop verdict with first-failing-rule reasons
    (llm/text.corpus_filter) — single codegen'd projection, no shuffle."""
    from aos_spark.llm import text as TX

    return TX.corpus_filter(_t(spark, sf_dir, "documents"))


ORACLE_CORPUS_FILTER = r"""
WITH feats AS (
  SELECT doc_id, trim(text) AS t,
         length(trim(text)) AS n_chars,
         length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(trim(text), '[^.,;:!?''"()\[\]]', '', 'g')) AS n_punct,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
sig AS (
  SELECT doc_id,
         CASE WHEN t IS NULL OR t = '' THEN 'empty'
              WHEN len(toks) < 10 THEN 'too_short'
              WHEN len(toks) > 5000 THEN 'too_long'
              WHEN n_alpha / GREATEST(n_chars, 1) < 0.5 THEN 'low_alpha'
              WHEN n_punct / GREATEST(n_chars, 1) > 0.3 THEN 'high_punct'
              WHEN len(list_distinct(toks)) / CAST(GREATEST(len(toks), 1) AS DOUBLE) < 0.3
                THEN 'repetitive' END AS reject_reason
  FROM feats)
SELECT doc_id, reject_reason IS NULL AS keep, reject_reason FROM sig
"""


def q_vocab_min_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with document frequencies (llm/text.build_vocab),
    min_df=5 — the Zipf-bounded frame the tf-idf tier broadcasts."""
    from aos_spark.llm import text as TX

    return TX.build_vocab(_t(spark, sf_dir, "documents"), min_df=5)


ORACLE_VOCAB = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
d AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> '')
SELECT term, COUNT(*) AS df FROM d GROUP BY term HAVING COUNT(*) >= 5
"""


def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd iteration over the embeddings table, k=4,
    deterministic lowest-id seeding (llm/cluster.kmeans_lloyd_step);
    exact-decimal distances make assignment bit-stable, output is
    long-form centroids."""
    from aos_spark.llm import cluster as C

    return C.kmeans_lloyd_step(_t(spark, sf_dir, "embeddings"), k=4)


ORACLE_KMEANS = """
WITH ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
ce AS (SELECT vec_id AS cid, dim, v AS c FROM ee WHERE vec_id < 4),
dist AS (
  SELECT e.vec_id, c.cid,
         SUM(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(30,15))) AS d
  FROM ee e JOIN ce c USING (dim) GROUP BY 1, 2),
assigned AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM dist)
  WHERE rn = 1)
SELECT a.cid AS cluster_id, COUNT(*) AS n_members, e.dim,
       ROUND(CAST(SUM(CAST(e.v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS centroid
FROM ee e JOIN assigned a USING (vec_id)
GROUP BY 1, 3
"""


R4_QUERIES = {
    "corpus_quality_filter": q_corpus_quality_filter,
    "vocab_min_df": q_vocab_min_df,
    "kmeans_lloyd_step": q_kmeans_step,
}

R4_ORACLES = {
    "corpus_quality_filter": ORACLE_CORPUS_FILTER,
    "vocab_min_df": ORACLE_VOCAB,
    "kmeans_lloyd_step": ORACLE_KMEANS,
}
