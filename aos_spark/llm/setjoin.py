"""Exact set-similarity self-join via prefix filtering (PPJoin-lite).

The LOSSLESS counterpart to MinHash-LSH (llm/dedup.py): LSH trades recall
for speed; prefix filtering prunes candidates with a guarantee that NO
pair at or above the Jaccard threshold is ever dropped (Chaudhuri et al.
"A Primitive Operator for Similarity Joins", ICDE'06; Bayardo et al.
"Scaling Up All Pairs Similarity Search", WWW'07).

The prefix-filter lemma: order every document's shingle set by one GLOBAL
total order, and take the first p_x = |x| - ceil(t*|x|) + 1 elements as
the prefix. If Jaccard(x, y) >= t then |x ∩ y| >= t*max(|x|,|y|) >=
ceil(t*|x|), so at most ceil(t*|x|) - 1 = |x| - p_x shared elements can
sit outside x's prefix — the prefixes of x and y must share at least one
element. Joining on prefix elements only is therefore complete, and the
exact within-candidate verification makes it sound.

Scale design (100 TB):
- The global order is ASCENDING document frequency ("rarest first"), the
  standard choice: a shingle lands in a join key only when it is in some
  doc's prefix, and frequent shingles sort to the suffix, so the hot keys
  of the candidate join are precisely the RARE shingles — bounded
  fan-out by construction rather than by an accuracy-losing cap (contrast
  ngram_jaccard_pairs' max_shingle_df, which undercounts when it fires).
- Candidate generation joins two prefix posting lists (sort-merge — both
  sides are corpus-sized; never broadcast), with the length filter
  t*|x| <= |y| <= |x|/t applied inside the join to cut pairs before the
  distinct.
- Verification is JVM-side array_intersect over the two ordered shingle
  arrays — no Python, no re-shingling (the arrays ride along from the
  one shingle pass).
- Per-DOCUMENT state is bounded by ``max_shingles_per_doc``: one
  pathological mega-document must not be allowed to materialize an
  unbounded array row (see ppjoin_pairs docstring for the
  truncate/raise semantics).

Reference anchor: the reference engine has no similarity join at all
(impact_analysis.py joins on exact admin codes only); this operator is
part of the LLM-training-data tier the build brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aos_spark.cache import persist_tracked
from aos_spark.llm.dedup import shingle_frame
from aos_spark.ops.exact_round import round_ratio6


def ppjoin_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingles_per_doc: int | None = 1_000_000,
    oversize: str = "truncate",
    max_candidate_pairs: int | None = None,
    on_over_budget: str = "raise",
) -> DataFrame:
    """All document pairs with shingle-set Jaccard >= ``threshold`` —
    exact for every pair of docs under ``max_shingles_per_doc`` (i.e. every
    pair in any corpus without a mega-doc; see the oversize semantics
    below for the over-cap case) — via prefix-filtered candidate
    generation.

    ``max_shingles_per_doc`` bounds the PER-DOCUMENT state: without it one
    pathological mega-document (hundreds of millions of tokens in a 100 TB
    crawl) materializes an unbounded array row in the ordered aggregation
    and again on both verify sides. The cap is enforced BEFORE the
    ``collect_list`` — shingles are ranked per doc by the same global
    (df ASC, shingle ASC) total order the prefix filter uses, and only the
    first ``max_shingles_per_doc`` ranks survive — so no aggregation buffer,
    shuffle row, or cached row ever exceeds the cap. (The ranking window
    itself streams through Spark's spillable window buffer, so it holds no
    unbounded heap state either.)

    Exactness semantics (the ``max_shingle_df`` precedent in
    llm/dedup.ngram_jaccard_pairs — cap effects documented, never silent):

    - ``oversize="truncate"`` (default): each document is represented by
      its ``max_shingles_per_doc`` RAREST shingles. Pairs where BOTH docs
      are under the cap — i.e. every pair, in any corpus without a
      mega-doc — are exact. A pair involving an over-cap doc is the exact
      Jaccard of the truncated set(s), a deterministic, documented
      approximation for that doc only.
    - ``oversize="raise"``: the job fails fast (in the ranking stage,
      before any unbounded row is built) with the offending doc id, for
      callers whose exactness contract must never silently degrade.
    - ``max_shingles_per_doc=None``: uncapped legacy behavior.

    ``max_candidate_pairs`` bounds the candidate join's TOTAL fan-out:
    the join emits exactly Σ C(pdf,2) rows over prefix-posting keys
    (pdf = number of docs carrying the shingle in their PREFIX), and the
    rarest-first global order cannot bound that sum when the vocabulary
    saturates (the r13 sf3 curve measured 9× candidate growth for 3×
    docs with every per-key df moderate). Because dropping a prefix key
    can LOSE pairs — a pair whose every shared prefix element is dropped
    is never generated, a recall loss the exactness contract forbids —
    the default here is ``on_over_budget='raise'``: fail fast at
    execution, naming an example dropped key, before the quadratic
    stage runs. ``on_over_budget='drop'`` is the documented degraded
    mode (LSH-like: surviving pairs remain EXACTLY verified — no false
    positives ever — but completeness now holds only for pairs whose
    FIRST common ordered element survives in both prefixes: the
    position filter's ubound test is proven against that first-common-
    element row, so a pair can be lost even when some LATER shared
    prefix key is kept), for callers who prefer bounded work over
    guaranteed recall.
    Default budget None (off).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if oversize not in ("truncate", "raise"):
        raise ValueError(f"oversize must be 'truncate' or 'raise', got {oversize!r}")
    if on_over_budget not in ("drop", "raise"):
        raise ValueError(
            f"on_over_budget must be 'drop' or 'raise', got {on_over_budget!r}"
        )
    if max_shingles_per_doc is not None and max_shingles_per_doc < 1:
        raise ValueError(
            f"max_shingles_per_doc must be >= 1, got {max_shingles_per_doc}"
        )
    sh = shingle_frame(df, id_col, text_col, n)
    # explode_OUTER, deliberately: plain explode triggers the
    # InferFiltersFromGenerate rule, whose size(...)>0 filter inlines the
    # whole shingle expression — including the regex split — INSIDE the
    # transform lambda, re-evaluating the split per shingle element
    # (quadratic in document length; a 3M-token doc ran >9 min before the
    # fix, 80 s after). Outer generate infers no filter, keeping the
    # tokenize one-eval-per-doc; the inner freq join drops the null rows
    # empty docs produce.
    ex = sh.select("id", F.explode_outer("shingles").alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )
    # Global document frequency: the total order is (df ASC, shingle ASC) —
    # deterministic, and ties broken by the shingle text itself so the
    # order is identical in any engine that reproduces the counts.
    #
    # r15 (guide §2.4): sdf is a COUNT OVER (PARTITION BY shingle) window
    # rather than the historical groupBy(shingle).count + self-join — the
    # join form exchanged the full exploded frame TWICE (aggregate build
    # + SMJ probe, un-dedupable by ReuseExchange) and needed a persist of
    # the exploded scan to keep the tokenize pass single-evaluation
    # (ADVICE r8). The window consumes the scan exactly once: one
    # exchange on shingle, no join, no persist. The explicit isNotNull
    # filter above replaces the null-row drop the inner join performed
    # (explode_outer emits one null row per empty doc).
    posting = ex.withColumn(
        "sdf", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    if max_shingles_per_doc is not None:
        # Rank each doc's shingles in the global order and cap BEFORE the
        # ordered aggregation, so per-doc state is bounded end-to-end.
        rk = F.row_number().over(
            Window.partitionBy("id").orderBy("sdf", "shingle")
        )
        posting = posting.withColumn("__rk", rk)
        if oversize == "raise":
            posting = posting.filter(
                F.when(
                    F.col("__rk") > max_shingles_per_doc,
                    F.raise_error(
                        F.concat(
                            F.lit("ppjoin_pairs: document "),
                            F.col("id").cast("string"),
                            F.lit(
                                " exceeds max_shingles_per_doc="
                                f"{max_shingles_per_doc} (oversize='raise')"
                            ),
                        )
                    ).isNotNull(),
                ).otherwise(F.lit(True))
            )
        else:
            posting = posting.filter(F.col("__rk") <= max_shingles_per_doc)
        posting = posting.drop("__rk")
    # (id, ordered shingle array): one aggregation keyed by doc; the sort
    # key rides inside the struct so array_sort gives (df, shingle) order.
    # The window above hash-partitions by id, so this groupBy reuses that
    # exchange (no second shuffle when the cap is active).
    ordered = (
        posting.groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sdf", "shingle"))).alias(
                "ord"
            )
        )
        .select(
            "id",
            F.transform("ord", lambda s: s["shingle"]).alias("ord"),
            F.size("ord").alias("n_sh"),
        )
    )
    ordered = persist_tracked(ordered)
    # No right-sizing coalesce here (r15, guide §2.4/§2.5): the r6-era
    # `coalesce(ceil(n/25k))` collapsed a bench-scale corpus to ONE
    # partition, and a single-partition child satisfies ANY clustered
    # distribution — so the candidate SortMergeJoin, the pair distinct,
    # and both verify attach joins all planned WITHOUT exchanges and the
    # entire candidate+array_intersect pipeline ran as one task (status
    # API: final stage tasks=1 at 7.4 s of an 11 s query). Full width
    # keeps the shingle exchange in the plan, AQE (with the 64 KB
    # minPartitionSize floor, session.py) sizes the reduce side, and the
    # verify stage spreads across the cores; the scheduler overhead the
    # coalesce once saved (r6: 5.1 -> 4.3 s) is absorbed by the same
    # floor, which coalesces near-empty cache-scan stages at the next
    # exchange instead of serializing the quadratic one.
    # prefix length p = n - ceil(t*n) + 1  (>= 1 whenever n >= 1).
    # The 1e-9 back-off guards double rounding: 0.07*100 evaluates to
    # 7.000000000000001, whose ceil is 8 — one prefix element short, a
    # completeness hole. Any true non-integer product t*n differs from an
    # integer by >= ~1/n >> 1e-9, so the guard can only repair, never
    # lengthen a correct ceil.
    p = (
        F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9)).cast("int")
        + F.lit(1)
    )
    pref = ordered.select(
        "id", "n_sh", F.posexplode(F.slice("ord", F.lit(1), p))
    ).select("id", "n_sh", "pos", F.col("col").alias("shingle"))
    if max_candidate_pairs is not None:
        from aos_spark.llm.dedup import (
            pair_budget_drop_set,
            raise_on_budget_drops,
        )

        # budget over PREFIX-posting df: the candidate join emits exactly
        # C(pdf,2) rows per prefix key, so bounding Σ C(pdf,2) bounds the
        # quadratic stage's row count (see docstring for the raise/drop
        # exactness contract). Persist: pref feeds this aggregate AND both
        # join sides — same ReuseExchange gap as the shingle scan above.
        pref = persist_tracked(pref)
        pdf = pref.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
        drops = pair_budget_drop_set(pdf, max_candidate_pairs)
        if on_over_budget == "raise":
            drops = raise_on_budget_drops(
                drops, "ppjoin_pairs", max_candidate_pairs
            )
        # unhinted anti-join: under saturation the drop set can be most
        # of the prefix vocabulary — let AQE size the strategy
        pref = pref.join(drops, "shingle", "left_anti")
    a = pref.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"),
        F.col("pos").alias("pos_a"), "shingle",
    )
    b = pref.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"),
        F.col("pos").alias("pos_b"), "shingle",
    )
    # PPJoin position filter (Xiao et al., "Efficient Similarity Joins for
    # Near Duplicate Detection", WWW'08): Jaccard >= t forces overlap
    # o >= t/(1+t)·(n_a+n_b). For the FIRST common element in the global
    # order (0-based positions pos_a, pos_b), every other common element
    # sits after it in BOTH ordered sets, so o <= 1 + min(n_a-pos_a-1,
    # n_b-pos_b-1); a matching row failing that bound is droppable, and
    # completeness holds because the first-common-element row always
    # satisfies it. The 1e-9 back-off mirrors the prefix-length guard.
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b"))
        - F.lit(1e-9)
    )
    ubound = F.lit(1) + F.least(
        F.col("n_a") - F.col("pos_a") - F.lit(1),
        F.col("n_b") - F.col("pos_b") - F.lit(1),
    )
    cand = (
        a.join(b.hint("merge"), "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: |y| >= t*|x| both ways — a pair failing it
            # cannot reach the threshold, so prune before the distinct
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
            # position filter: overlap upper bound from the prefix
            # positions must clear the threshold's overlap requirement
            & (ubound >= min_overlap)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact verification: intersect the two (distinct-element, cap-bounded)
    # ordered shingle arrays — the SAME representation the prefix filter
    # saw, so the length/position filters and the verify are consistent
    # even when truncation fired. Jaccard = |A∩B| / (|A|+|B|-|A∩B|).
    sa = ordered.select(
        F.col("id").alias("id_a"),
        F.col("ord").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = ordered.select(
        F.col("id").alias("id_b"),
        F.col("ord").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    # Threshold test on the UNROUNDED ratio — rounding first would admit
    # pairs up to 5e-7 below t and (for a >6-decimal t) drop true
    # positives, breaking the exactness contract. Round only in the
    # output projection, purely for display stability.
    #
    # n_common rides an explode(array(...)) of ONE element (r16, guide
    # §2.4/§4.4-adjacent): a plain projection lets the optimizer push
    # the Jaccard filter INTO the attach join condition and re-expand
    # the alias, so array_intersect evaluated 2× per candidate and 3×
    # per surviving pair (verified in the r15 plan). A Generate node is
    # a pushdown/collapse barrier for predicates on its output, so the
    # intersect now runs exactly ONCE per candidate pair; the
    # single-element explode neither drops nor multiplies rows.
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            F.explode(
                F.array(F.size(F.array_intersect("sh_a", "sh_b")))
            ).alias("n_common"),
        )
        .withColumn(
            "jaccard_raw",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard_raw") >= threshold)
    )
    return verified.select(
        "id_a",
        "id_b",
        # output rounding via the engine-exact rational idiom (the filter
        # above stays on the unrounded ratio — see the comment there)
        round_ratio6(
            F.col("n_common"),
            F.col("n_a") + F.col("n_b") - F.col("n_common"),
        ).alias("jaccard"),
    )
