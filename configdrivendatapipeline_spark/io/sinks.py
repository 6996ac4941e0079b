"""Parameterized sink writers (SURVEY.md §2.1).

Config shape::

    {format: parquet|csv|json|orc|avro|kafka, path: ...
     (bootstrap_servers+topic for kafka), mode: append|overwrite|
     overwrite_dynamic|error (kafka: append only — a topic cannot be
     overwritten), partition_by: [col, ...], options: {...}}

``avro``/``kafka`` ride Spark's public packaged DataSources — same
classpath boundary as the source side (io/sources.py): absent the
package, the writer raises the precise --packages remedy.

Scale notes: ``partition_by`` keys should be low-cardinality and
query-aligned (date, region) so downstream reads get partition
pruning; ``overwrite_dynamic`` replaces only the partitions present
in the batch — the idempotent-reload pattern for daily loads at
lake scale.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def write_sink(df: DataFrame, cfg: dict[str, Any]) -> None:
    """Write a DataFrame to one configured sink (batch).

    Layout controls for scan-time pruning at scale: ``cluster_by``
    repartitions on the given columns (co-locates each key's rows in
    one output file set) and ``sort_by`` sorts WITHIN partitions
    before writing — together they tighten per-file min/max ranges so
    parquet row-group skipping prunes on those columns. Neither adds
    a driver-side step; sort-within-partitions never triggers a
    global range exchange.
    """
    def _cols(name):
        # same scalar-shape check as the materialize op: a bare string
        # "col" would iterate as characters under *spread and lay out
        # by one-letter phantom columns
        v = cfg.get(name)
        if not v:
            return []
        if isinstance(v, str) or not isinstance(v, (list, tuple)):
            raise ValueError(
                f"sink {name} must be a list of columns, got {v!r}"
            )
        return [str(c) for c in v]

    cluster_by = _cols("cluster_by")
    if cluster_by:
        df = df.repartition(*cluster_by)
    sort_by = _cols("sort_by")
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    fmt = cfg.get("format", "parquet")
    mode = cfg.get("mode", "error")

    if fmt == "kafka":
        # Message-bus sink: rows must already carry a `value` column
        # (and optionally `key`); serialize upstream with a derive/
        # sql step (to_json / CAST AS BINARY). A topic is append-only,
        # so `mode` defaults to append and anything else is rejected
        # rather than silently dropped.
        kmode = cfg.get("mode", "append")
        if kmode != "append":
            raise ValueError(
                f"sink format 'kafka' is append-only; mode: {kmode!r} "
                "is not supported — remove the key or set mode: append"
            )
        writer = (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", cfg["bootstrap_servers"])
            .option("topic", cfg["topic"])
            .mode("append")
            .options(**dict(cfg.get("options") or {}))
        )
        _packaged_save(writer, fmt)
        return

    writer = df.write.format(fmt).options(**dict(cfg.get("options") or {}))

    if mode == "overwrite_dynamic":
        # Replace only partitions present in this batch.
        writer = writer.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    else:
        writer = writer.mode(mode)

    partition_by = cfg.get("partition_by")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "avro":
        _packaged_save(writer, fmt, cfg["path"])
    else:
        writer.save(cfg["path"])


def _packaged_save(writer, fmt: str, path: str | None = None) -> None:
    from configdrivendatapipeline_spark.io.sources import _PACKAGED

    try:
        writer.save(path) if path is not None else writer.save()
    except Exception as e:
        if "Failed to find data source" in str(e) or "ClassNotFound" in str(e):
            raise RuntimeError(
                f"sink format {fmt!r} needs its Spark package on the "
                f"cluster classpath: --packages {_PACKAGED[fmt]}"
            ) from e
        raise
