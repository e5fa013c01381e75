"""Distributed WER / CER: edit-distance metrics between transcript columns.

The ASR evaluation loop at corpus scale: compare a hypothesis transcript
column against a reference column row by row (word error rate = the
Levenshtein distance over WORD tokens, normalized by reference length, with
the substitution/insertion/deletion breakdown), then aggregate corpus WER as
total-edits / total-reference-words (the standard pooled definition — NOT the
mean of per-row rates, which over-weights short utterances).

Engine-extension operator (the reference has no ASR path — SURVEY.md §2.5).
Execution: mapInPandas with a numpy DP per row, vectorized over one DP
dimension (O(n) numpy row ops per reference token instead of O(n*m) Python
cell updates); embarrassingly parallel, no shuffle; the aggregate is one
partial-agg sum. Character-level CER uses the same machinery over character
tokens.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WER_DDL = ("id string, ref_len int, hyp_len int, substitutions int, "
           "insertions int, deletions int, edits int, error_rate double")

#: DP cell budget for the backtrace matrix (int32): 25M cells ~= 100 MB.
#: Rows beyond it (e.g. char-level CER on 50k-char transcripts, whose full
#: matrix would be ~10 GB) fall back to a two-row distance-only DP — exact
#: total edits, null S/I/D breakdown.
BACKTRACE_CELL_LIMIT = 25_000_000


def edit_distance_only(ref_ids: np.ndarray, hyp_ids: np.ndarray) -> int:
    """Levenshtein distance with O(m) memory (two rolling rows, same
    vectorized prefix-min scan as :func:`edit_counts`) — no backtrace."""
    n, m = len(ref_ids), len(hyp_ids)
    prev = np.arange(m + 1, dtype=np.int64)
    js = np.arange(1, m + 1)
    for i in range(1, n + 1):
        sub = prev[:-1] + (hyp_ids != ref_ids[i - 1])
        np.minimum(sub, prev[1:] + 1, out=sub)
        pm = np.minimum.accumulate(sub - js)
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = js + np.minimum(pm, i)
        prev = cur
    return int(prev[m])


def edit_counts(ref: list, hyp: list) -> Tuple[int, int, int]:
    """(substitutions, insertions, deletions) of the minimum-edit alignment
    of ``hyp`` against ``ref`` (standard Levenshtein with unit costs; among
    cost-equal alignments the backtrace prefers substitutions, then
    deletions, then insertions — the conventional sclite-style tie-break).

    DP rows run vectorized over the hyp dimension: per reference token one
    np.minimum reduction instead of a Python inner loop.
    """
    n, m = len(ref), len(hyp)
    if n == 0:
        return 0, m, 0
    if m == 0:
        return 0, 0, n
    # map tokens to ints so the DP compares ints, not strings
    vocab: dict = {}
    r = np.array([vocab.setdefault(t, len(vocab)) for t in ref])
    h = np.array([vocab.setdefault(t, len(vocab)) for t in hyp])
    # cost matrix rows kept for the backtrace: (n+1, m+1) int32
    dp = np.empty((n + 1, m + 1), dtype=np.int32)
    dp[0] = np.arange(m + 1)
    js = np.arange(1, m + 1)
    for i in range(1, n + 1):
        sub = dp[i - 1, :-1] + (h != r[i - 1])
        np.minimum(sub, dp[i - 1, 1:] + 1, out=sub)  # fold deletions in
        # the insertion recurrence row[j] = min(sub[j-1], row[j-1]+1) is a
        # min-plus scan with unit increments; it collapses to a prefix-min:
        #   row[j] = j + min(i, min_{k<=j}(sub[k-1] - k))
        pm = np.minimum.accumulate(sub - js)
        dp[i, 0] = i
        dp[i, 1:] = js + np.minimum(pm, i)
    # backtrace
    i, j = n, m
    subs = ins = dels = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (r[i - 1] != h[j - 1]):
            if r[i - 1] != h[j - 1]:
                subs += 1
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            dels += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return subs, ins, dels


def _tokens(text, char_level: bool) -> list:
    if text is None:
        return []
    return list(text) if char_level else text.split()


def error_report(
    df: DataFrame,
    ref_col: str = "ref",
    hyp_col: str = "hyp",
    id_col: str = "id",
    char_level: bool = False,
) -> DataFrame:
    """Per-row WER (or CER with ``char_level=True``) report: S/I/D breakdown,
    reference length, and the row error rate edits / max(ref_len, 1) — an
    empty reference with an empty hypothesis scores 0.0, and a null
    hypothesis scores as all deletions (the standard ASR-eval treatment of a
    missing recognition result). Rows whose DP matrix would exceed
    :data:`BACKTRACE_CELL_LIMIT` report exact ``edits`` from a rolling-row DP
    with null S/I/D (the breakdown needs the full backtrace matrix)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("id", "ref_len", "hyp_len", "substitutions",
                                   "insertions", "deletions", "edits",
                                   "error_rate")}
            for rid, ref, hyp in zip(pdf[id_col], pdf[ref_col], pdf[hyp_col]):
                rt, ht = _tokens(ref, char_level), _tokens(hyp, char_level)
                if (len(rt) + 1) * (len(ht) + 1) > BACKTRACE_CELL_LIMIT:
                    vocab: dict = {}
                    r_ids = np.array([vocab.setdefault(t, len(vocab)) for t in rt])
                    h_ids = np.array([vocab.setdefault(t, len(vocab)) for t in ht])
                    s = i = d = None
                    e = edit_distance_only(r_ids, h_ids)
                else:
                    s, i, d = edit_counts(rt, ht)
                    e = s + i + d
                out["id"].append(rid)
                out["ref_len"].append(len(rt))
                out["hyp_len"].append(len(ht))
                out["substitutions"].append(s)
                out["insertions"].append(i)
                out["deletions"].append(d)
                out["edits"].append(e)
                out["error_rate"].append(e / max(len(rt), 1))
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(ref_col).alias(ref_col), F.col(hyp_col).alias(hyp_col)
    ).mapInPandas(run, schema=WER_DDL)


def corpus_error_rate(report: DataFrame) -> DataFrame:
    """Pooled corpus WER/CER from an :func:`error_report` frame: one row with
    total S/I/D, total reference tokens, and edits/ref_tokens — the standard
    pooled rate (per-row rates averaged would over-weight short rows)."""
    return report.agg(
        F.count(F.lit(1)).cast("long").alias("rows"),
        F.sum("substitutions").cast("long").alias("substitutions"),
        F.sum("insertions").cast("long").alias("insertions"),
        F.sum("deletions").cast("long").alias("deletions"),
        F.sum("edits").cast("long").alias("edits"),
        F.sum("ref_len").cast("long").alias("ref_tokens"),
        # greatest(..., 1) guards an all-empty-reference frame: under ANSI
        # (the Spark 4 default) a bare division would abort the whole agg
        # with DIVIDE_BY_ZERO instead of reporting a rate — same guard the
        # per-row path applies with max(len(rt), 1)
        (F.sum("edits") / F.greatest(F.sum("ref_len"), F.lit(1)))
        .alias("error_rate"),
    )
