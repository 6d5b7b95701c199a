"""Sources and sinks (SURVEY.md §2.1)."""

from aos_spark.io import readers, writers  # noqa: F401
