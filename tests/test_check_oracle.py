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
