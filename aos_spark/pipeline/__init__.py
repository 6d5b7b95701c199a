"""Pipeline tier: initialize / update / patch jobs (SURVEY.md §3) composed
from the operator library, plus parquet-backed control tables."""
