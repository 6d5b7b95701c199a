"""The local gate replica must be at-least-as-strict as the driver's hash.

Round-1 shipped two driver-red queries because the old canonicalizer
(%.9g floats, no type tags) collapsed exactly the two divergence classes
the driver detects (VERDICT r1, "What's wrong" #3). These tests pin the
hardened behavior so the gate can never silently weaken again.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from check_oracle import canon_value, value_hash  # noqa: E402


def test_int_float_type_drift_detected():
    # DuckDB HUGEINT -> driver float 36.0 vs Spark BIGINT 36 (sessionize bug)
    assert canon_value(36) != canon_value(36.0)


def test_last_ulp_float_divergence_detected():
    # the exact pair from the judge's q1_pricing_summary repro
    a = float.fromhex("0x1.0bf438da25aeep+28")
    b = float.fromhex("0x1.0bf438da17c1cp+28")
    assert a != b and canon_value(a) != canon_value(b)


def test_bool_is_not_int():
    assert canon_value(True) != canon_value(1)


def test_value_hash_order_insensitive_but_type_sensitive():
    cols = ["a", "b"]
    rows1 = [(1, 2.0), (3, 4.0)]
    rows2 = [(3, 4.0), (1, 2.0)]  # same rows, different order
    rows3 = [(1, 2), (3, 4)]      # ints where floats were
    assert value_hash(rows1, cols) == value_hash(rows2, cols)
    assert value_hash(rows1, cols) != value_hash(rows3, cols)


# ---------------------------------------------------------------------------
# Oracle output-type lock (VERDICT r4): the driver canonicalizes through
# pandas, where DuckDB HUGEINT (any uncast integer SUM) silently becomes
# float64 and LIST cells crash the hasher. 13 queries were locally green but
# driver-red in r4. DESCRIBE-ing every oracle (plans only, never executes —
# no Spark, <5 s total) pins the whole class out permanently.
# ---------------------------------------------------------------------------

import os  # noqa: E402

import duckdb  # noqa: E402
import pytest  # noqa: E402

from check_oracle import (  # noqa: E402
    SAFE_DUCKDB_TYPES,
    TABLES,
    unsafe_oracle_cols,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_unsafe_type_detector_flags_uncast_sum(duck):
    # an uncast integer SUM is HUGEINT — the exact r4 failure shape
    bad = unsafe_oracle_cols(duck, "SELECT SUM(o_orderkey) AS s FROM orders")
    assert bad == [("s", "HUGEINT")]
    ok = unsafe_oracle_cols(
        duck, "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders"
    )
    assert ok == []


def test_unsafe_type_detector_flags_list(duck):
    bad = unsafe_oracle_cols(
        duck, "SELECT list(o_orderstatus) AS l FROM orders"
    )
    assert bad and bad[0][0] == "l"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not present"
)
def test_every_oracle_output_type_is_pandas_safe(duck):
    from aos_spark.queries import ORACLES

    offenders = {}
    for name, sql in ORACLES.items():
        bad = unsafe_oracle_cols(duck, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles with pandas-unsafe output types (allowed: "
        f"{sorted(SAFE_DUCKDB_TYPES)}): {offenders}"
    )


def test_local_correctness_artifact_covers_every_registered_query():
    """VERDICT r5 "Next round" #3: the committed CORRECTNESS_LOCAL.json had
    drifted to 157 entries while the registry held 189 — five query waves
    shipped without a full local gate run. Lock: the artifact of record
    must list EXACTLY the registered queries, and every row must be green.
    Adding a query without rerunning `python scripts/check_oracle.py`
    turns this red."""
    import json
    from pathlib import Path

    from aos_spark.queries import QUERIES

    art = Path(__file__).resolve().parent.parent / "CORRECTNESS_LOCAL.json"
    local = json.loads(art.read_text())
    # Reserved (double-underscored) keys carry artifact metadata, not
    # query rows; "__env__" is REQUIRED (VERDICT r8 #2 — version/config
    # forensics so a one-off divergence is attributable after the fact).
    env = local.pop("__env__", None)
    assert env is not None, "CORRECTNESS_LOCAL.json lost its __env__ block"
    for key in ("pyspark", "duckdb", "python", "spark.sql.ansi.enabled",
                "spark.sql.shuffle.partitions", "sf_dir"):
        assert key in env, f"__env__ block lost its '{key}' field"
    # The artifact of record is the sf0.01 gate — a committed artifact
    # from another sf (e.g. a diagnostic sf0.1 sweep) is not it. The
    # round-8 divergence hid behind exactly this ambiguity.
    assert env["sf_dir"].rstrip("/").endswith("sf0.01"), env["sf_dir"]
    local = {k: v for k, v in local.items() if not k.startswith("__")}
    missing = set(QUERIES) - set(local)
    stale = set(local) - set(QUERIES)
    assert not missing, f"queries never gate-run locally: {sorted(missing)}"
    assert not stale, f"artifact rows for unregistered queries: {sorted(stale)}"
    red = {
        n: v for n, v in local.items()
        if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    }
    assert not red, f"locally-red queries committed: {sorted(red)}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata not present")
def test_capped_machinery_is_exact_at_gate_sfs(duck):
    """Several gate queries (dedup_ngram_jaccard, containment_near_dup,
    split_leakage_check, dedup_threshold_curve) run the max_shingle_df-
    capped candidate machinery against UNCAPPED oracles; the equivalence
    argument is "no shingle exceeds the cap at the gate SFs" (VERDICT
    r5 #4, r6 review). This turns that data-dependent assumption into a
    checked invariant: if regenerated testdata ever ships a 3-gram in
    more than max_shingle_df documents, this goes red BEFORE the driver
    gate does."""
    from aos_spark.llm.dedup import ngram_jaccard_pairs  # noqa: F401
    import inspect

    from aos_spark.llm import dedup

    cap = inspect.signature(dedup.ngram_jaccard_pairs).parameters[
        "max_shingle_df"
    ].default
    for sf in ("sf0.001", "sf0.01"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/{sf}/documents.parquet'"
        )
        max_df = con.execute(r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN list_transform(range(len(t) - 2), i -> array_to_string(t[i+1:i+3], ' '))
           ELSE [array_to_string(t, ' ')] END) AS shingles
  FROM (SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS t
        FROM documents))
SELECT MAX(c) FROM (
  SELECT COUNT(*) AS c FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
  GROUP BY s)
""").fetchone()[0]
        assert max_df <= cap, (
            f"{sf}: a shingle appears in {max_df} docs > cap {cap} — the "
            "capped Spark machinery and the uncapped oracles now diverge"
        )


def _is_micro_hugeint_sum(sql: str, alias: str) -> bool:
    """True iff ``alias``'s DEFINING expression in ``sql`` is a
    micro-scaled HUGEINT sum: ``SUM(CAST(... * 1000000 AS HUGEINT))``.

    ADVICE r13: the old cross-string ``SUM\\(CAST\\(.*?`` scan could bind
    the prefix to a DIFFERENT aggregate than the one defining the alias
    (any earlier SUM(CAST( bridges via .*? + re.S). A bare [^)]* fix is
    too strict — real numerators nest CASTs (``CAST(x AS DECIMAL(18,2))``)
    — so this parses the defining expression itself: scan backwards from
    ``AS <alias>`` with paren balancing to recover exactly the expression
    the alias names, then fullmatch it.

    ADVICE r14 hardening, two holes in the single-site backward scan:
    (a) a compound definition like ``__x + SUM(CAST(... AS HUGEINT)) AS
    __sqm`` truncated at the depth-0 ``+`` and certified just the SUM
    suffix — now a depth-0 arithmetic operator adjoining the recovered
    expression makes the SITE fail instead of truncate; (b) only the
    FIRST ``AS <alias>`` occurrence was checked, so a second definition
    of the same alias in another subquery rode along uncertified — now
    every occurrence must independently pass."""
    import re

    sites = list(re.finditer(rf"\sAS {alias}\b", sql))
    if not sites:
        return False
    for m in sites:
        end = m.start()
        depth = 0
        j = end
        while j > 0:
            c = sql[j - 1]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    break  # stepped past the expression into an enclosing (
                depth -= 1
            elif depth == 0 and not (c.isalnum() or c == "_"):
                # outside all parens only the function name (SUM/AVG/...)
                # can extend the expression leftwards; anything else ends it
                break
            j -= 1
        # compound-definition guard: if the char sequence immediately left
        # of the recovered expression (whitespace skipped) is an arithmetic
        # operator at depth 0, the true defining expression extends further
        # left (e.g. ``__x + SUM(...)``) — refuse to certify the suffix
        k = j
        while k > 0 and sql[k - 1].isspace():
            k -= 1
        if k > 0 and sql[k - 1] in "+-*/":
            return False
        expr = sql[j:end].strip()
        if not re.fullmatch(
            r"SUM\(CAST\(.*\* 1000000 AS HUGEINT\)\)", expr, re.S
        ):
            return False
    return True


def test_micro_hugeint_certifier_rejects_compound_and_multi_site():
    """Regression for the ADVICE r14 holes: a compound definition whose
    depth-0 suffix is a pure micro sum must NOT certify, and EVERY
    ``AS <alias>`` site must pass, not just the first."""
    pure = "SUM(CAST(x * 1000000 AS HUGEINT))"
    assert _is_micro_hugeint_sum(f"SELECT {pure} AS __s FROM t", "__s")
    # compound: truncating at the depth-0 '+' certified just the suffix
    assert not _is_micro_hugeint_sum(
        f"SELECT __x + {pure} AS __s FROM t", "__s"
    )
    assert not _is_micro_hugeint_sum(
        f"SELECT __x+{pure} AS __s FROM t", "__s"
    )
    assert not _is_micro_hugeint_sum(
        f"SELECT {pure} / 2 AS __s FROM t", "__s"
    )
    # multi-site: a second, impure definition of the same alias in
    # another subquery used to ride along unchecked
    assert not _is_micro_hugeint_sum(
        f"WITH a AS (SELECT {pure} AS __s FROM t), "
        "b AS (SELECT SUM(y) AS __s FROM t) SELECT 1",
        "__s",
    )
    assert _is_micro_hugeint_sum(
        f"WITH a AS (SELECT {pure} AS __s FROM t), "
        f"b AS (SELECT {pure} AS __s FROM u) SELECT 1",
        "__s",
    )
    # nested CAST in the numerator remains certifiable (the r13 fix)
    assert _is_micro_hugeint_sum(
        "SELECT SUM(CAST(CAST(x AS DECIMAL(18,2)) * 1000000 AS HUGEINT))"
        " AS __s FROM t",
        "__s",
    )


def test_oracle_inline_rounding_idioms_are_structurally_certified():
    """Every integral-division rounding idiom hand-inlined in an oracle
    string must have EXACTLY the certified exact_round shape, so the
    fuzz certification of ops/exact_round transfers to the inline copies.

    Round 9's review weighed interpolating duck_round_ratio6() into the
    ~40 oracle f-strings versus keeping the inline SQL; interpolation
    would require converting large plain-string oracles to f-strings
    (brace-escaping churn across six files) for zero value change, so
    the repo keeps the inline idiom and this test makes the
    copy-consistency review MECHANICAL instead of manual: for every
    occurrence, the half-up bias term must equal the divisor operand
    (num·2·s + d) // (d·2) — a numerator/denominator copy-paste mismatch
    here silently rounds against the wrong denominator, the exact bug
    class the idiom exists to prevent — the divisor must be a HUGEINT
    cast, and the numerator must be micro-scaled. Any OTHER integral
    division in an oracle must be on the reviewed allowlist below."""
    import re

    from aos_spark.queries import ORACLES

    idiom = re.compile(
        r"CAST\(\((?P<left>.+?) \* 2 \+ (?P<bias>.+?)\) "
        r"// \((?P<div>.+?) \* 2\) AS DOUBLE\) / 1000000\.0"
    )
    # the money-cents variant (exact_round.round_micro_cents): micro-unit
    # HUGEINT sum -> half-up cents -> /100. Fixed constants 10000/20000
    # are the s and 2s of floor((2m + s)/(2s)) at micro->cents scale; the
    # alias must be defined as a micro-scaled HUGEINT sum in the same
    # oracle, so the numerator contract travels with the idiom.
    cents_idiom = re.compile(
        r"CAST\(\((?P<num>__\w+) \* 2 \+ 10000\) // 20000 AS DOUBLE\)"
        r" / 100\.0"
    )
    # reviewed non-rounding integral divisions (each exact and
    # engine-identical on its non-negative operands):
    allowed_other = [
        # RRF's exact micro-unit score 1e9 // (60 + rank)
        re.compile(r"\d+ // \(60 \+ [a-z]+\.rank\)"),
        # constant bucketing (chunk ids, length bands): x // <int literal>
        re.compile(r"\w+ // \d+\b"),
        # the order_autocorrelation floor-mean: micro-scaled decimal sum
        # // COUNT(*) with NO half-up bias, BY DESIGN — both engines
        # truncate non-negative integral division identically; mirrored
        # by Spark's `div` and locked by test_stats_cross_engine.py
        re.compile(r"AS HUGEINT\) // COUNT\(\*\)"),
    ]

    bad = []
    for name, sql in ORACLES.items():
        stripped = sql
        for m in idiom.finditer(sql):
            left, bias, div = m.group("left"), m.group("bias"), m.group("div")
            if bias != div:
                bad.append((name, f"bias != divisor: {bias!r} vs {div!r}"))
            if not (div.startswith("CAST(") and div.endswith("AS HUGEINT)")):
                bad.append((name, f"divisor not a HUGEINT cast: {div!r}"))
            if not (
                left.endswith("* 1000000")
                or re.search(r"\* 1000000 AS HUGEINT\)$", left)
                # an alias numerator is fine IFF its defining aggregate in
                # the same oracle is a micro-scaled HUGEINT sum — the same
                # contract the cents idiom enforces (r13: q1's averages now
                # reuse the __sqm/__spm micro sums instead of re-scaling)
                or (
                    re.fullmatch(r"__\w+", left)
                    and _is_micro_hugeint_sum(sql, left)
                )
            ):
                bad.append((name, f"numerator not micro-scaled: {left!r}"))
            stripped = stripped.replace(m.group(0), "")
        for m in cents_idiom.finditer(sql):
            num = m.group("num")
            if not _is_micro_hugeint_sum(sql, num):
                bad.append(
                    (name, f"cents numerator {num!r} is not a micro-scaled "
                           f"HUGEINT sum in this oracle")
                )
            stripped = stripped.replace(m.group(0), "")
        for rest in re.finditer(r".{0,40}//.{0,40}", stripped):
            frag = rest.group(0)
            if not any(p.search(frag) for p in allowed_other):
                bad.append((name, f"unvetted integral division: ...{frag}..."))
    assert not bad, "\n".join(f"{n}: {msg}" for n, msg in bad)
