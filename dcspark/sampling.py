"""Deterministic hash-based splits and stratified sampling.

Training-data pipelines need *reproducible* train/val/test assignment and
sampling at 100 TB: the same row must land in the same split on every run, on
any cluster size, regardless of partitioning, row order, or Spark version —
which rules out `DataFrame.randomSplit`/`sample` (both are seed + partition
dependent: a repartition reshuffles the assignment). The standard web-scale
answer is keyed hashing (TFX/Beam call it fingerprint-based splitting): a
row's split is a pure function of its id.

Mechanism: ``md5(id || '|' || salt)`` — the first 8 hex chars are a uniform
32-bit draw. All comparisons happen on the *fixed-width lowercase hex string*
(lexicographic == numeric for fixed-width hex), so the exact same assignment
is reproducible in any engine with md5 — that is what the DuckDB oracle for
`split_sample_assign` checks, byte for byte. Everything is a whole-stage-
codegen JVM expression: zero shuffle, zero UDF, filter-pushdown friendly;
changing ``salt`` re-rolls every assignment (use a new salt per experiment,
keep it fixed per dataset release).
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex width of the uniform draw: 8 chars = 32 bits, plenty below md5's 128
_HEX_DIGITS = 8
_SPACE = 1 << (4 * _HEX_DIGITS)


def _threshold_hex(fraction: float) -> str:
    """Cumulative fraction -> fixed-width lowercase hex boundary string."""
    bound = min(max(int(round(fraction * _SPACE)), 0), _SPACE)
    # a full-coverage boundary must compare greater than every 8-char draw
    return "g" if bound >= _SPACE else format(bound, f"0{_HEX_DIGITS}x")


def hash_hex(id_col: Union[str, Column], salt: str = "") -> Column:
    """The row's uniform draw as an 8-char lowercase hex string.

    NULL ids have no identity to key on: they all hash the sentinel string
    below, so every NULL-id row lands in the SAME split / sample decision —
    deterministic and visible rather than silently dropped (a null-intolerant
    concat would make the draw NULL: splits would pile into the last label and
    samples would drop the rows without a trace). Key on a real id.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(
        F.md5(F.concat(F.coalesce(c.cast("string"), F.lit("\x00null")),
                       F.lit("|" + salt))), 1, _HEX_DIGITS)


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: Dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split, deterministically.

    ``fractions`` maps split name -> fraction in insertion order; the last
    split absorbs any rounding remainder (and everything above the cumulative
    sum, so fractions summing to 1.0 always cover). Splits are disjoint and
    exhaustive by construction — one chained CASE on the hash draw.
    """
    if not fractions:
        raise ValueError("fractions must name at least one split")
    h = hash_hex(id_col, salt)
    names = list(fractions)
    expr: Optional[Column] = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(fractions[name])
        cond = h < F.lit(_threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (keyed Bernoulli)."""
    return df.filter(hash_hex(id_col, salt) < F.lit(_threshold_hex(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: Union[str, Column],
    fractions: Dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages/sources).

    ``fractions`` maps stratum value -> keep fraction; strata not listed —
    including a NULL stratum — keep ``default_fraction``. The draw is salted
    per-row only (not per-stratum), so tightening one stratum's fraction keeps
    a strict subset — stable incremental re-releases of the same corpus.
    """
    s = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    h = hash_hex(id_col, salt)
    expr: Optional[Column] = None
    for value, frac in fractions.items():
        cond = (s == F.lit(value)) & (h < F.lit(_threshold_hex(float(frac))))
        expr = cond if expr is None else expr | cond
    fallback = h < F.lit(_threshold_hex(default_fraction))
    # coalesce: a NULL stratum makes isin() NULL, which would silently drop
    # the row instead of applying the documented default fraction
    others = F.coalesce(~s.isin(list(fractions)), F.lit(True)) if fractions else F.lit(True)
    expr = (fallback & others) if expr is None else (expr | (fallback & others))
    return df.filter(expr)


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Union[str, Column],
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability equal to its own weight, deterministically.

    The keep test is ``uniform_draw(id) < clamp(weight, 0, 1)`` with the same
    keyed md5 draw as every other sampler here, so quality-weighted corpus
    selection (weight = a quality score in [0, 1]) is reproducible across
    runs, engines, and repartitions; lowering a row's weight can only remove
    it, never re-admit it, and rows with NULL weight keep probability 0
    (dropped deterministically, never a silent NULL comparison).

    The per-row threshold is the weight rendered as the same fixed-width hex
    boundary used by the global samplers (the 'g' sentinel covers weight=1.0,
    which must admit every draw) — still pure codegen string ops, no UDF.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    wc = F.least(F.greatest(F.coalesce(w.cast("double"), F.lit(0.0)),
                            F.lit(0.0)), F.lit(1.0))
    # rint, not F.round: Python's round() (used by _threshold_hex for the
    # global samplers) is round-half-to-EVEN while F.round is HALF_UP, so an
    # exact-half product would put the boundary one draw apart between this
    # sampler and hash_sample at the same weight — rint is Spark's half-even
    bound = F.rint(wc * F.lit(float(_SPACE))).cast("long")
    thresh = F.when(bound >= _SPACE, F.lit("g")).otherwise(
        F.format_string(f"%0{_HEX_DIGITS}x", bound))
    return df.filter(hash_hex(id_col, salt) < thresh)


def mixture_plan(
    docs: DataFrame,
    domain_col: str,
    targets: Dict[str, float],
    budget_tokens: Optional[float] = None,
    budget_share: Optional[float] = None,
    token_col: Optional[str] = None,
) -> DataFrame:
    """Per-domain sampling fractions that steer the corpus toward a target
    mixture — the "data mixing" step of LLM corpus assembly (rebalance
    languages/sources to published recipe weights under a token budget).

    ``targets`` maps domain value -> desired share of the OUTPUT mixture
    (normalized here, so {'en': 3, 'de': 1} means 75/25). The budget is
    either absolute (``budget_tokens``) or relative (``budget_share`` of the
    WHOLE corpus's tokens, unlisted domains included — so 'keep 40% of the
    corpus at this mixture' scales with the input). Per domain:

        fraction_d = min(1, budget * share_d / tokens_d)

    The cap means an under-represented domain is taken whole (the realized
    mixture then undershoots its target — visible in the plan, never silent);
    domains absent from ``targets`` get no row (dropped by the sample's inner
    join). ``token_col`` weights by a token-count column; None counts docs.

    Returns (domain, tokens, docs, target_share, fraction). Scale shape: one
    partial-aggregated groupBy over the corpus; everything after operates on
    the domain-count table (rows = |domains|).
    """
    if (budget_tokens is None) == (budget_share is None):
        raise ValueError("pass exactly one of budget_tokens / budget_share")
    tot = float(sum(targets.values()))
    if tot <= 0:
        raise ValueError("targets must have positive total weight")
    spark = docs.sparkSession
    share_df = spark.createDataFrame(
        [(str(k), float(v) / tot) for k, v in targets.items()],
        "domain string, target_share double")
    tok = F.col(token_col).cast("double") if token_col else F.lit(1.0)
    totals = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(tok).alias("tokens"), F.count(F.lit(1)).alias("docs"))
    plan = totals.join(F.broadcast(share_df), "domain")
    if budget_share is not None:
        grand = totals.agg(F.sum("tokens").alias("__T"))
        plan = plan.crossJoin(F.broadcast(grand))
        budget = F.lit(float(budget_share)) * F.col("__T")
    else:
        budget = F.lit(float(budget_tokens))
    return (
        plan.withColumn(
            "fraction",
            F.least(F.lit(1.0), budget * F.col("target_share") / F.col("tokens")))
        .select("domain", "tokens", "docs", "target_share", "fraction")
    )


def mixture_sample(
    docs: DataFrame,
    id_col: str,
    domain_col: str,
    targets: Dict[str, float],
    budget_tokens: Optional[float] = None,
    budget_share: Optional[float] = None,
    token_col: Optional[str] = None,
    salt: str = "",
) -> DataFrame:
    """Deterministically sample ``docs`` to the `mixture_plan` fractions.

    The plan (|domains| rows) broadcast-joins onto the corpus and the keyed
    md5 draw filters per-row — same reproducibility contract as every sampler
    here: stable across runs, engines, partitionings; tightening the budget
    keeps a strict subset. Output = input columns + ``fraction``; domains
    outside ``targets`` (and NULL domains) are dropped by the inner join.
    Cost at scale: the plan's one groupBy scan plus one map-only filter pass.
    """
    plan = mixture_plan(docs, domain_col, targets,
                        budget_tokens=budget_tokens, budget_share=budget_share,
                        token_col=token_col)
    # reserved names for the plan's columns: a corpus that already carries a
    # 'fraction' column would otherwise produce a duplicate after the join
    # and the weighted sampler's reference would be ambiguous
    p = plan.select(F.col("domain").alias("__mix_domain"),
                    F.col("fraction").alias("__mix_fraction"))
    joined = docs.join(
        F.broadcast(p),
        docs[domain_col] == F.col("__mix_domain"), "inner").drop("__mix_domain")
    out = weighted_hash_sample(joined, id_col, "__mix_fraction", salt=salt)
    return out.withColumn("fraction", F.col("__mix_fraction")).drop("__mix_fraction")


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: Dict[str, float],
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """`hash_split`, but near-duplicates NEVER straddle a split boundary.

    Splitting by doc id leaks: a near-duplicate pair split across train and
    test inflates eval scores exactly like benchmark contamination. The fix
    is to split by *cluster*: connected components over the near-dup pair
    graph give every doc a component representative, and the split draw keys
    on ``coalesce(component, doc_id)`` — whole clusters move together, docs
    in no cluster keep their own key (bit-identical to plain `hash_split`
    for them, so adding pairs never reshuffles the unclustered majority).

    Scale shape: components run on the pair table only (see
    `cluster.connected_components`); the corpus-side cost is one equi-join
    against the (node, component) map — component maps for near-dup graphs
    are duplicate-count-sized, so AQE broadcasts them — plus the usual
    zero-shuffle hash CASE. Returns ``docs`` + ``split_col``.
    """
    from dcspark.cluster import connected_components

    cc = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("component").alias("__cc"))
    keyed = docs.join(cc, id_col, "left").withColumn(
        "__split_key",
        F.coalesce(F.col("__cc"), F.col(id_col)).cast("string"))
    return (
        hash_split(keyed, "__split_key", fractions, salt=salt,
                   split_col=split_col)
        .drop("__cc", "__split_key")
    )
