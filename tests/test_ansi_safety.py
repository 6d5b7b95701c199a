"""Static lock against ANSI-mode long-overflow arithmetic.

Round-5 driver red: ``bloom_semijoin_prune`` multiplied a full-range
``xxhash64`` output by a probe index; under the driver's Spark-4 default
``spark.sql.ansi.enabled=true`` the long multiply raised
ARITHMETIC_OVERFLOW, while the builder session (ansi=false) silently
wrapped — local green, driver red (VERDICT r5 "What's wrong" #1/#2).

The dynamic complement is scripts/check_oracle.py now running the whole
gate ANSI-on; this test is the static net: walk every aos_spark module's
AST and flag any expression that multiplies (or adds-then-multiplies) a
value derived DIRECTLY from ``F.xxhash64`` / ``F.hash`` without a prior
``pmod`` / ``%`` reduction. Those functions return full-range 64/32-bit
values, so any product with another non-constant term can overflow a
long; reduce with pmod FIRST (the fixed bloom pattern,
ops/bloom.py:_positions).
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

PKG = Path(__file__).resolve().parent.parent / "aos_spark"

UNBOUNDED_HASH_FNS = {"xxhash64", "hash", "crc32"}
REDUCERS = {"pmod", "mod", "shiftright", "bit_and"}


def _call_name(node: ast.AST) -> str | None:
    if isinstance(node, ast.Call):
        f = node.func
        if isinstance(f, ast.Attribute):
            return f.attr
        if isinstance(f, ast.Name):
            return f.id
    return None


class HashMultChecker(ast.NodeVisitor):
    """Per-module pass: track names bound to a raw (un-reduced) hash call,
    then flag Mult BinOps touching them or touching a raw hash call
    inline. Scope tracking is per-function (names reset on FunctionDef),
    which matches how every operator in this repo is written."""

    def __init__(self) -> None:
        self.tainted: set[str] = set()
        self.violations: list[tuple[int, str]] = []

    def _is_raw_hash(self, node: ast.AST) -> bool:
        name = _call_name(node)
        if name in UNBOUNDED_HASH_FNS:
            return True
        if isinstance(node, ast.Name) and node.id in self.tainted:
            return True
        # h1 + h2, (h1), h1.cast(...) keep the taint
        if isinstance(node, ast.BinOp) and isinstance(node.op, (ast.Add, ast.Sub)):
            return self._is_raw_hash(node.left) or self._is_raw_hash(node.right)
        if name == "cast" and isinstance(node.func, ast.Attribute):
            return self._is_raw_hash(node.func.value)
        return False

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        outer = self.tainted
        self.tainted = set()
        self.generic_visit(node)
        self.tainted = outer

    visit_AsyncFunctionDef = visit_FunctionDef  # type: ignore[assignment]

    def visit_Assign(self, node: ast.Assign) -> None:
        self.generic_visit(node)
        raw = self._is_raw_hash(node.value)
        reduced = _call_name(node.value) in REDUCERS
        for t in node.targets:
            if isinstance(t, ast.Name):
                if raw and not reduced:
                    self.tainted.add(t.id)
                else:
                    self.tainted.discard(t.id)

    def visit_Call(self, node: ast.Call) -> None:
        # inside a reducer call the hash is being bounded — don't descend
        # into its arguments looking for violations of the *multiply* rule,
        # but DO keep scanning nested calls for their own multiplies.
        self.generic_visit(node)

    def visit_BinOp(self, node: ast.BinOp) -> None:
        self.generic_visit(node)
        if isinstance(node.op, ast.Mult) and (
            self._is_raw_hash(node.left) or self._is_raw_hash(node.right)
        ):
            self.violations.append(
                (node.lineno, ast.unparse(node)[:100])
            )


@pytest.mark.parametrize(
    "path",
    sorted(PKG.rglob("*.py")),
    ids=lambda p: str(p.relative_to(PKG)),
)
def test_no_unreduced_hash_multiplication(path: Path) -> None:
    tree = ast.parse(path.read_text())
    checker = HashMultChecker()
    checker.visit(tree)
    assert not checker.violations, (
        f"{path}: multiplication of an un-pmod-reduced xxhash64/hash value "
        f"— overflows a long under spark.sql.ansi.enabled=true (the "
        f"driver's default; see ops/bloom.py:_positions for the safe "
        f"pattern): {checker.violations}"
    )


def test_lock_catches_the_r5_bloom_pattern() -> None:
    """The checker must be red on the exact r5 bug shape."""
    bad = (
        "def f(key, m_bits, n_hashes):\n"
        "    h1 = F.xxhash64(key)\n"
        "    h2 = F.xxhash64(key, F.lit(7))\n"
        "    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))"
        " for i in range(n_hashes)]\n"
    )
    checker = HashMultChecker()
    checker.visit(ast.parse(bad))
    assert checker.violations, "checker failed to flag the r5 bloom bug"

    good = (
        "def f(key, m_bits, n_hashes):\n"
        "    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))\n"
        "    h2 = F.pmod(F.xxhash64(key, F.lit(7)), F.lit(m_bits))\n"
        "    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))"
        " for i in range(n_hashes)]\n"
    )
    checker = HashMultChecker()
    checker.visit(ast.parse(good))
    assert not checker.violations, checker.violations
