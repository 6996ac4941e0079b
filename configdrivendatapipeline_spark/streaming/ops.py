"""Streaming primitives: event-stream source + run-to-completion.

Scale notes (100 TB posture): streaming aggregations keep per-key
state in the state store — production config points
``spark.sql.streaming.stateStore.providerClass`` at RocksDB and sets
watermarks so state is bounded; ``Trigger.AvailableNow`` is also the
production backfill mode (drains the backlog with streaming
semantics, then stops).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def file_identity_tag(path: str) -> str:
    """Short tag of a file's identity (abspath + mtime + size).

    The ONE keying rule for every streaming scratch dir: the driver
    regenerates fixtures IN PLACE between rounds, and a path-keyed
    stage marker would silently replay the previous round's rows.
    Absolute path, because a relative one would stat fine
    (cwd-relative) but symlink-resolve against the scratch dir."""
    path = os.path.abspath(path)
    try:
        st = os.stat(path)
        ident = f"{path}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        ident = path
    return hashlib.md5(ident.encode()).hexdigest()[:10]


def _stage_dir(path: str) -> str:
    """FileStreamSource wants a directory; the fixture is one parquet
    file. Stage it (symlink; idempotent) into a scratch dir keyed on
    the file's identity — a symlink tracks in-place regeneration, but
    the copyfile fallback would not, and the driver has regenerated
    fixtures between rounds."""
    path = os.path.abspath(path)
    d = os.path.join(
        tempfile.gettempdir(), "cddp_stream_src", file_identity_tag(path)
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    # lexists, not exists: exists() follows a dangling symlink and
    # would re-attempt the symlink into EEXIST.
    if not os.path.lexists(link):
        try:
            os.symlink(path, link)
        except OSError:
            import shutil

            shutil.copyfile(path, link)
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-stream source.

    Schema is pinned from a footer-only batch read (streaming file
    sources require one); the ns `ts` column is truncated to µs
    exactly like the batch loader, keeping stream/batch/oracle parity.
    """
    from configdrivendatapipeline_spark.queries import ensure_session_confs, normalize_ts

    ensure_session_confs(spark)
    path = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(path)
    sdf = (
        spark.readStream.schema(static.schema).format("parquet").load(_stage_dir(path))
    )
    return normalize_ts(sdf)


def run_available_now(
    sdf: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion (AvailableNow) into
    an in-memory sink; returns the materialized result table.

    This is the batch-equivalence harness from SURVEY.md §5 item 6 —
    the same plan in production would point at a real sink with a
    continuous trigger.
    """
    name = name or f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
