"""Partition-width helpers that never touch ``DataFrame.rdd``.

``df.rdd.getNumPartitions()`` is the obvious way to ask "how many
splits did this frame arrive in?", but it forces a full
plan-to-RDD conversion at *query-build* time — an analyzer round
trip plus a JVM RDD materialization paid once per builder call,
in exactly the code paths that run per registered query. The only
question the hot builders actually need answered is "is this a
narrow local scan that should be widened before a CPU-heavy map
stage?", and for file sources that is answerable from the scan's
file list (``df.inputFiles()`` — a logical-plan inspection, no RDD
conversion).

Heuristic, and deliberately conservative about shuffles:

- file-backed scan → split count ~ number of files. Test-scale
  parquet is one file per table, so narrow scans are detected and
  widened exactly as before. (A few huge files would undercount
  actual splits and trigger one extra repartition — which at that
  shape is the repartition you want before a CPU-bound map stage.)
- frame with NO file source (in-memory, streaming) → ``None``
  ("leave it alone").

CONTRACT: apply these to raw scans (projections of a scan are
fine), not to post-shuffle frames. ``inputFiles()`` reports the
LEAF scans of any plan, so a frame downstream of a groupBy/join
would be judged by its leaves' file count and could pick up a
useless extra repartition (the frame already has
``spark.sql.shuffle.partitions`` splits). Both engine call sites —
``queries.spread`` and ``dedup.shingle_hash_sets`` — feed scan
projections; keep it that way.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame


def scan_split_count(df: DataFrame) -> Optional[int]:
    """Estimated arrival split count for a file-backed scan, or
    ``None`` when the frame is not a plain file scan (already
    shuffled / in-memory / streaming) and should be left alone.
    """
    try:
        files = df.inputFiles()
    except Exception:  # streaming frames raise; treat as non-scan
        return None
    n = len(files)
    return n if n > 0 else None


def widen_narrow_scan(
    df: DataFrame,
    *,
    min_factor: int = 2,
    key: Optional[Union[str, Column]] = None,
) -> DataFrame:
    """Repartition a frame that arrived in fewer file splits than
    cores (the local single-row-group-parquet case). At lake scale
    sources arrive pre-split, the condition is false, and this is a
    no-op — the shuffle is never paid where it would hurt.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    splits = scan_split_count(df)
    if splits is None or splits * min_factor > target:
        return df
    if key is not None:
        return df.repartition(target, key)
    return df.repartition(target)
