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
import math
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

#: id(session) → [source bytes noted since the last drain]. Streaming
#: plans cannot be re-coalesced by AQE, so the stateful-shuffle
#: partition count a query STARTS with is the one it keeps — and each
#: state-store partition carries fixed per-micro-batch overhead
#: (delta/commit files, store init). Every streaming source builder
#: notes its backing file size here; :func:`run_available_now` drains
#: the notes and sizes the shuffle like AQE would size a batch
#: exchange: ceil(bytes / advisoryPartitionSizeInBytes), clamped to
#: [min(defaultParallelism, _STREAM_PARTS_FLOOR), defaultParallelism].
#: A 100 TB backlog therefore still gets full cluster parallelism
#: (the clamp ceiling), while a small AvailableNow drain stops paying
#: per-partition state overhead ~cores× larger than its data.
_SRC_BYTES: dict[int, list[int]] = {}

#: Parallelism floor (pre-clamp to cores): keeps CPU headroom for
#: map-heavy micro-batches even when the backlog is tiny.
_STREAM_PARTS_FLOOR = 4


def note_stream_source(spark: SparkSession, path: str) -> None:
    """Record a streaming source's on-disk size for the next
    :func:`run_available_now` on this session. Files and directories
    (staged feeds of symlinks) both work; unreadable paths are
    ignored (the sizing then falls back to the session default)."""
    total = 0
    try:
        if os.path.isdir(path):
            for entry in os.scandir(path):
                try:
                    total += entry.stat(follow_symlinks=True).st_size
                except OSError:
                    pass
        else:
            total = os.path.getsize(path)
    except OSError:
        return
    _SRC_BYTES.setdefault(id(spark), []).append(total)


def _parse_byte_conf(v: str) -> int:
    """Parse Spark byte-valued conf strings ('64MB', '256m', '67108864b',
    plain ints)."""
    s = v.strip().lower()
    for suffix, mult in (
        ("pb", 1 << 50), ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
        ("kb", 1 << 10), ("p", 1 << 50), ("t", 1 << 40), ("g", 1 << 30),
        ("m", 1 << 20), ("k", 1 << 10), ("b", 1),
    ):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


def scaled_stream_partitions(spark: SparkSession, total_bytes: int) -> int:
    """Stateful-shuffle partition count for a streaming drain over
    ``total_bytes`` of source data — the AQE coalescing rule applied
    at plan time (streaming exchanges are exempt from AQE): one
    partition per advisory-size chunk, floored for CPU headroom,
    capped at the cluster's parallelism."""
    adv = _parse_byte_conf(
        spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        )
    )
    dp = spark.sparkContext.defaultParallelism
    floor = min(dp, _STREAM_PARTS_FLOOR)
    return max(floor, min(dp, math.ceil(total_bytes / max(adv, 1))))


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
    note_stream_source(spark, path)
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

    Stateful-shuffle sizing: the session's shuffle-partition conf is
    transiently set from the source bytes noted by
    :func:`note_stream_source` (see ``_SRC_BYTES`` — the AQE
    coalescing rule applied at plan time, because streaming exchanges
    are exempt from AQE and each state-store partition costs fixed
    per-batch I/O) and restored after the drain. Partition count
    never changes results here: aggregations / dropDuplicates /
    stream joins / per-key state are partition-count-independent and
    the watermark is a global min. ``SPARK_GRAFT_STREAM_PARTS``
    overrides the derivation (production knob / A-B probes).
    """
    name = name or f"stream_{uuid.uuid4().hex[:12]}"
    spark = sdf.sparkSession
    noted = _SRC_BYTES.pop(id(spark), None)
    env = os.environ.get("SPARK_GRAFT_STREAM_PARTS")
    target: int | None = None
    if env:
        target = int(env)
    elif noted:
        target = scaled_stream_partitions(spark, sum(noted))
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    if target is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if target is not None and prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sdf.sparkSession.table(name)
