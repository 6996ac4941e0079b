"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The modern extension point for sources Spark has no built-in reader
for — REST APIs, proprietary formats, synthetic generators — without
writing a JVM DataSourceV2. The reader declares its own partitioning
(`partitions()`), so Spark schedules one task per partition and the
source scales out exactly like a file scan; rows stream out of plain
Python iterators per partition, never through the driver.

The shipped example source generates a deterministic synthetic
document corpus: every row is a pure function of its doc_id, so (a)
any engine can replay the exact output (the DuckDB oracle rebuilds
the text with the same arithmetic — the source itself is
hash-verified), and (b) retries/speculative tasks are safe by
construction. Swap the generator body for an HTTP client and the
partition list for an endpoint shard list to get a real API source
with the same scale shape.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: fixed vocabulary — mirrored literally in the SQL oracle.
VOCAB = (
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
)


def synthetic_text(doc_id: int) -> str:
    """5 + doc_id%10 tokens, token k = VOCAB[(doc_id·31 + k) mod 16]."""
    n = 5 + doc_id % 10
    return " ".join(VOCAB[(doc_id * 31 + k) % len(VOCAB)] for k in range(n))


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after registration.

    Options: ``shards`` (partition count) and ``rows_per_shard``.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, shard INT, text STRING"

    def reader(self, schema) -> "SyntheticDocsReader":
        shards = int(self.options.get("shards", 4))
        rows = int(self.options.get("rows_per_shard", 50))
        if shards < 1 or rows < 1:
            # zero/negative counts would yield an EMPTY source with no
            # signal — the same loud-validation contract as the rest
            # of the config surface
            raise ValueError(
                f"synthetic_docs needs shards >= 1 and rows_per_shard "
                f">= 1; got shards={shards}, rows_per_shard={rows}"
            )
        return SyntheticDocsReader(shards, rows)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, shards: int, rows_per_shard: int) -> None:
        self.shards = shards
        self.rows_per_shard = rows_per_shard

    def partitions(self):
        # One InputPartition per shard → one Spark task per shard; the
        # generator below runs executor-side inside that task.
        return [InputPartition(i) for i in range(self.shards)]

    def read(self, partition: InputPartition):
        shard = partition.value
        base = shard * self.rows_per_shard
        for i in range(self.rows_per_shard):
            doc_id = base + i
            yield (doc_id, shard, synthetic_text(doc_id))


def register(spark) -> None:
    """Idempotent registration (re-registering the same class is a
    no-op error-wise but cheap to guard)."""
    spark.dataSource.register(SyntheticDocsDataSource)
