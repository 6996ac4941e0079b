"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design posture (SURVEY.md §4):
AQE on (runtime coalesce + skew-join split), broadcast threshold
explicit, Arrow enabled for the Pandas-UDF slow path, and shuffle
partitions sized from the environment rather than Spark's static 200.
On a real cluster the same factory is used with ``master=None`` so
spark-submit / the cluster manager supplies the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions: on local[N] runs a small multiple of cores keeps
# every reducer busy without tiny-partition overhead; on a cluster this
# is overridden via conf (AQE coalesces downward at runtime anyway).
_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "configdrivendatapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Every conf here is a public Spark conf; all are overridable via
    ``extra_conf`` or pipeline YAML ``spark_conf``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    else:
        # Fall back to local[N] ONLY when no master was supplied any
        # other way: spark-submit --master lands in the spark.master
        # JVM system property (readable via SparkConf), NOT an env
        # var — checking os.environ for "spark.master" would override
        # a submitted yarn/k8s master and silently run the "cluster"
        # job single-node on the driver.
        from pyspark import SparkConf

        submitted = SparkConf().contains("spark.master")
        if not submitted and not os.environ.get("SPARK_MASTER"):
            builder = builder.master(f"local[{_DEFAULT_CPUS}]")

    n_shuffle = shuffle_partitions or _DEFAULT_CPUS
    conf: dict[str, str] = {
        # Runtime re-planning: coalesce small shuffle partitions,
        # split skewed join partitions (SURVEY.md §4 AQE rows).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(n_shuffle),
        # Broadcast small dims (region/nation/supplier class tables).
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Arrow transfer for the pandas-UDF slow path.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Read-side split sizing so a 100 TB scan yields sane tasks.
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # Deterministic session timezone for timestamp oracles.
        "spark.sql.session.timeZone": "UTC",
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns
        # type, so read as long and convert (queries.load truncates
        # to µs exactly as DuckDB's ns→µs cast does).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Local driver memory; ignored under spark-submit cluster mode.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
