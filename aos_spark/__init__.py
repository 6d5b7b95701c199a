"""aos_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of unicef-drp/Ahead-of-the-Storm-DATAPIPELINE.

Brand-new, Spark-first design (NOT a port): the reference's single-process
pandas/GeoPandas pipeline is re-expressed as declarative DataFrame / SQL
plans optimized by Catalyst, with the spatial hot joins reduced to quadkey
equi-joins (see aos_spark.geo.quadkey) and the remaining geometry predicates
implemented as Arrow-batched pandas UDFs over a dependency-free geometry
kernel (aos_spark.geo.wkt).

Layout:
  session    SparkSession factory (AQE, dynamic partition overwrite, Arrow)
  schemas    explicit StructTypes for every table contract
  io/        readers/writers, partition layout, control tables
  geo/       quadkey arithmetic, WKT kernel, spatial join strategies
  ops/       the operator library (SURVEY.md section 2) as DataFrame transforms
  pipeline/  initialize / update / patch job compositions
  report/    JSON situation-report assembly
  llm/       large-scale training-data operators: dedup, similarity,
             text analysis, multimodal column plumbing
  streaming/ Structured Streaming forecast poll loop
"""

__version__ = "0.1.0"
