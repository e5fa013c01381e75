"""The corpus-side hot-bucket guard, shared by every blocked self-join.

One shape, three users (simsearch embedding blocks, imagefp dHash blocks,
imagefp video frame-hash blocks): drop rows whose (block, key) bucket holds
more than ``max_bucket`` rows — an over-full bucket is non-discriminative
(degenerate mass: all-zero vectors, boilerplate frames, silence) and would
emit k² candidate pairs from the downstream equi-self-join.

Mechanism: a groupBy census over the exploded key frame (shuffles only
map-side-combined (keys..., count) partials), filter to the tiny hot-key
frame (broadcasts), one LEFT ANTI join — never a window count, which would
shuffle AND SORT every exploded corpus row including the degenerate mass the
cap exists to drop. The guarded frame is PERSISTED before return because
every caller self-joins it: without the persist the census + anti-join
lineage evaluates once per join side (VERDICT r04 measured a 4.4× and a
1.5× regression from exactly that). Callers own the release — attach the
returned frame to the result's ``_dcspark_cached`` handle so
``pipeline_ckpt.release_caches`` frees it after consumption.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_key_guard(t: DataFrame, keys: Sequence[str],
                  max_bucket: Optional[int]) -> DataFrame:
    """Anti-join away over-full key buckets, then persist for the self-join.

    ``max_bucket=None`` skips the census (the persist still applies — the
    caller self-joins either way)."""
    keys = list(keys)
    if max_bucket is not None:
        hot = (t.groupBy(*keys)
               .agg(F.count(F.lit(1)).alias("_bc"))
               .filter(F.col("_bc") > max_bucket)
               .select(*keys))
        t = t.join(hot, on=keys, how="left_anti")
    return t.persist()
