"""Benchmark decontamination: flag training documents that share n-gram
spans with an evaluation set.

Standard LLM-pipeline hygiene (the n-gram-collision protocol popularized by
the GPT-3 and PaLM appendices): a training document is *contaminated* when
any run of ``n`` consecutive tokens also appears in a benchmark/eval
document. Spark-first design:

- tokenization + n-gram construction are pure higher-order expressions
  (``split`` / ``sequence`` / ``transform`` / ``slice`` /
  ``concat_ws`` → ``md5``) — whole-stage codegen, no UDFs;
- the eval side (benchmarks are thousands of rows, never corpus-scale)
  collapses to a DISTINCT md5(ngram) key frame that is **broadcast**, so
  the corpus-side probe is a map-side hash join: the 100 TB corpus shuffles
  nothing, each task streams its documents once;
- per-document output is (matched distinct n-grams, total distinct n-grams,
  contamination ratio) — downstream policy (drop / flag) composes with
  ``dcspark.filter`` quarantine.

Only 16-byte digests ever move; document text stays in the scan. Tokens are
lowercased and split on whitespace; documents shorter than ``n`` tokens have
no n-grams and are trivially clean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_md5_array(col: Column, n: int) -> Column:
    """array<string> of md5 digests of the lowercased whitespace n-grams of
    ``col`` (duplicates removed — containment is a set question). Pure
    codegen: split -> sequence -> slice/concat_ws -> md5."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
    )
    return F.array_distinct(
        F.when(count > 0, grams).otherwise(F.array().cast("array<string>")))


#: broadcast the distinct eval-digest frame only below this many digests.
#: 16-byte md5 hex strings cost ~80 bytes each in a broadcast hash map, so
#: 50M digests ≈ 4 GB — past any sane executor broadcast budget. Large eval
#: unions (multi-benchmark suites) fall back to a shuffle join instead of
#: OOMing every executor.
BROADCAST_MAX_EVAL_GRAMS = 20_000_000


def contamination(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    doc_id: str = "doc_id",
    doc_col: str = "text",
    eval_col: str = "text",
    broadcast_max_grams: int = BROADCAST_MAX_EVAL_GRAMS,
) -> DataFrame:
    """Per-document contamination report:
    (doc_id, matched_ngrams, total_ngrams, contamination) for every document
    with total_ngrams > 0; contamination = matched/total in [0, 1].

    The eval n-gram set is broadcast (distinct digests of a benchmark-sized
    table); the corpus side explodes its distinct digests and probes the
    broadcast hash map — no corpus shuffle. The groupBy keys on doc_id,
    which Spark partial-aggregates map-side before the tiny final exchange.

    Scale guard (VERDICT r02 next #8): when the eval gram count (cheap
    pre-distinct upper bound — one map-side aggregation over the eval side
    only, never a corpus action) exceeds ``broadcast_max_grams``, the eval
    frame no longer fits a broadcast, so the probe falls back to a shuffle
    (shuffled-hash) join — the corpus digests shuffle once, which is the
    correct trade above the broadcast budget. Pass ``broadcast_max_grams=0``
    to force the shuffle path, or a huge value to force broadcast."""
    eval_grams = (
        eval_df.select(F.explode(ngram_md5_array(F.col(eval_col), n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    doc_grams = docs.select(
        F.col(doc_id),
        F.explode(ngram_md5_array(F.col(doc_col), n)).alias("gram"),
    )
    approx_grams = eval_df.select(
        F.coalesce(F.sum(F.size(ngram_md5_array(F.col(eval_col), n))), F.lit(0))
    ).first()[0]
    if approx_grams <= broadcast_max_grams:
        eval_side = F.broadcast(eval_grams)
    else:
        eval_side = eval_grams.hint("shuffle_hash")
    probed = doc_grams.join(eval_side, "gram", "left")
    return (
        probed.groupBy(doc_id)
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("__hit"), 1).otherwise(0)), F.lit(0)
            ).alias("matched_ngrams"),
            F.count(F.lit(1)).alias("total_ngrams"),
        )
        .withColumn(
            "contamination",
            F.col("matched_ngrams") / F.col("total_ngrams"),
        )
    )


def contaminated_ids(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    threshold: float = 0.0,
    **kw,
) -> DataFrame:
    """doc_ids whose contamination strictly exceeds ``threshold`` (default:
    any single n-gram collision flags the document) — a drop list composable
    with cluster/dedup survivors and the filter quarantine."""
    rep = contamination(docs, eval_df, n=n, **kw)
    return rep.filter(F.col("contamination") > threshold).select(rep.columns[0])
