"""Small local DataFrames as JVM LocalRelations (no Python at runtime).

``spark.createDataFrame(list_of_tuples, ...)`` routes through
``applySchemaToPythonRDD``: the rows become a PYTHON RDD whose scan
spins up Python workers and unpickles rows at QUERY RUN time — measured
~0.5-1.0 s per run for a 128-row codebook table (llm/pq), charged to
every query that embeds such a frame (guide §4: eliminate the
JVM↔Python boundary).

The fix is NOT a literal-expression frame (an explode over an array of
literal structs): that re-creates the janino pathology pq.py already
documents — a multi-KB expression tree recompiled per action (measured
r16: the 128-row codebook as literal structs took pq_encode from 1.6 s
to 8.2 s warm). A SQL ``VALUES`` inline table instead resolves to a
**LocalRelation** during analysis — the rows become DATA held by the
plan, not expressions: zero codegen, zero Python, and broadcast builds
read them directly.

Intended for SMALL frames (≤ a few thousand rows) of simple types;
larger driver-side data should be written to storage or parallelized.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _sql_literal(v, dt: T.DataType) -> str:
    ddl = dt.simpleString()
    if v is None:
        return f"CAST(NULL AS {ddl})"
    if isinstance(v, bool):
        return f"CAST({'TRUE' if v else 'FALSE'} AS {ddl})"
    if isinstance(v, int):
        return f"CAST({v} AS {ddl})"
    if isinstance(v, float):
        # repr() is the shortest round-trip decimal form; parsing it as
        # a double yields the identical IEEE value in any engine
        return f"CAST('{v!r}' AS {ddl})"
    if isinstance(v, Decimal):
        return f"CAST('{v}' AS {ddl})"
    if isinstance(v, str):
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"CAST('{esc}' AS {ddl})"
    raise TypeError(f"literal_frame: unsupported value {v!r} for {ddl}")


def literal_frame(
    spark: SparkSession,
    rows: list[tuple],
    schema: str | T.StructType,
) -> DataFrame:
    """Build a small DataFrame from driver-local rows as a SQL VALUES
    inline table (analyzer-folded to a LocalRelation — plain data, no
    Python RDD and no literal expression tree at runtime). ``schema`` is
    a DDL string (``"a INT, b DOUBLE"``) or a StructType; every value is
    cast to its field's type, so None/ints/floats/strings/bools/Decimals
    all land with the declared type."""
    st = (
        T._parse_datatype_string(schema)
        if isinstance(schema, str)
        else schema
    )
    if not rows:
        return spark.createDataFrame([], st)
    cols = ", ".join(f.name for f in st.fields)
    body = ",\n".join(
        "("
        + ", ".join(
            _sql_literal(v, f.dataType) for v, f in zip(row, st.fields)
        )
        + ")"
        for row in rows
    )
    return spark.sql(f"SELECT * FROM (VALUES {body}) AS __lf({cols})")
