"""Static lock against the generate/filter-inference quadratic (round 8).

A plain ``F.explode``/``F.posexplode`` over a TRANSFORM-built array lets
the ``InferFiltersFromGenerate`` rule add ``size(<arg>) > 0``, and
predicate pushdown then substitutes projection aliases INTO that filter
— so an array built by a higher-order lambda over a derived column
(tokens from a regex split) re-evaluates the derivation at every
``element_at`` inside the lambda: the document is re-tokenized once per
gram, quadratic in document length. A 3M-token doc took >9 min
pre-fix and ~80 s after switching the three affected sites to the
``_outer`` variants (outer generates infer no filter); r6 had already
hit the same pathology in ``source_minhash_similarity``.

This test is the static net: walk every aos_spark module's AST and flag
any non-outer explode whose argument contains a call to a gram-builder
(``shingles_from_tokens`` / ``gram_occurrences``) — the shapes whose
``when(...)``-wrapped output actually triggers the inference AND whose
lambda references a derived token column the pushdown inlines. Checked
empirically before narrowing: a literal ``F.array(...)`` constructor
(LSH banding) and a bare outermost ``F.transform`` (BPE pair explode)
infer NO filter at all in the optimized plan, so they stay allowed;
sequences and plain splits cost at most one extra per-ROW evaluation, a
constant factor, not a quadratic.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "aos_spark"

GENERATORS = {"explode", "posexplode"}  # the *_outer variants are safe
LAMBDA_BUILDERS = {"shingles_from_tokens", "gram_occurrences"}


def _call_name(node: ast.AST) -> str | None:
    if isinstance(node, ast.Call):
        f = node.func
        if isinstance(f, ast.Attribute):
            return f.attr
        if isinstance(f, ast.Name):
            return f.id
    return None


def _contains_lambda_builder(node: ast.AST) -> str | None:
    for sub in ast.walk(node):
        name = _call_name(sub)
        if name in LAMBDA_BUILDERS:
            return name
    return None


def test_no_plain_explode_over_lambda_built_arrays():
    violations: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if _call_name(node) not in GENERATORS:
                continue
            for arg in node.args:
                builder = _contains_lambda_builder(arg)
                if builder:
                    violations.append(
                        f"{path.relative_to(PKG.parent)}:{node.lineno} "
                        f"plain {_call_name(node)}() over {builder}(...) — "
                        f"use the _outer variant (InferFiltersFromGenerate "
                        f"re-evaluates the lambda per element otherwise)"
                    )
    assert not violations, "\n".join(violations)
