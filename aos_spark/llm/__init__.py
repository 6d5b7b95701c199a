"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north-star): dedup,
similarity search, text analysis, and multimodal column plumbing — all
designed for 100 TB inputs: JVM-side expressions in the hot path, shuffles
keyed to bounded-cardinality buckets, candidate generation before any
pairwise work.
"""

from aos_spark.llm import dedup, multimodal, similarity, text  # noqa: F401
