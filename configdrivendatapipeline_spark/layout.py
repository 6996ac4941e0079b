"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for file skipping.

A table sorted by one column prunes scans on THAT column only; a
100 TB fact table queried by both customer and date needs per-file
min/max ranges bounded in BOTH dimensions. Interleaving the bits of
the quantized dimensions into one Morton code and clustering by it
bounds every dimension's spread within a file to ~range/2^(bits/ndims)
— parquet/Delta-style min-max skipping then works for predicates on
any participating column.

Everything is exact integer arithmetic (quantize by integer division,
interleave by literal shifts), so the layout is reproducible across
engines, retries and the DuckDB oracle. At scale the z-value is a pure
map-side expression; the only movement is the final
``repartitionByRange(zval)`` write (one range shuffle — the same cost
as any global sort-for-layout, but buying skipping in ALL dimensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: str, lo: str, hi: str, bits: int) -> Column:
    """Map column ``col`` in [lo, hi] onto the integer grid
    [0, 2^bits) — exact: ((col - lo) * 2^bits) div (hi - lo + 1).
    Integer ``div``, never ``/`` + floor: exact on longs, identical in
    both engines (double division can round across an integer
    boundary once operands leave the 2^53 grid)."""
    return F.expr(
        f"((CAST({col} AS BIGINT) - CAST({lo} AS BIGINT)) * {1 << bits}) div "
        f"(CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT) + 1)"
    )


def interleave(qcols: list[Column], bits: int) -> Column:
    """Morton code: bit i of quantized column c lands at position
    ``i * len(qcols) + c``. All shift amounts are Python literals, so
    the whole code is one codegen'd integer expression."""
    n = len(qcols)
    z = F.lit(0).cast("long")
    for c, q in enumerate(qcols):
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + c)
    return z


def with_zorder(
    df: DataFrame, cols: list[str], bits: int = 8, out: str = "zval"
) -> DataFrame:
    """Attach the Morton code of ``cols`` (integer-valued columns).

    Per-column min/max come from ONE global aggregate broadcast back
    as a 1-row frame — at lake scale these are catalog statistics and
    the aggregate disappears entirely.

    Overflow is LOUD, never silent: ``quantize`` computes
    ``(col - lo) * 2^bits`` in BIGINT, so a column whose span exceeds
    ``2^(63-bits)`` (epoch-nanosecond keys, synthetic 64-bit ids)
    would wrap and emit garbage z-values — the layout silently stops
    clustering and every downstream scan loses its min-max pruning
    with no error anywhere. The 1-row stats frame therefore carries a
    ``raise_error`` guard per column (evaluated once, engine-side),
    and the Morton width itself (``bits * len(cols)``) must fit a
    signed 64-bit value.
    """
    if bits <= 0:
        raise ValueError(f"bits must be positive; got {bits}")
    if bits * len(cols) > 62:
        raise ValueError(
            f"zorder width bits*ndims = {bits}*{len(cols)} exceeds 62: "
            "the interleaved Morton code would overflow a signed "
            "64-bit zval — lower bits or drop a dimension"
        )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__rawlo_{c}"))
        aggs.append(F.max(c).alias(f"__hi_{c}"))
    # Span guard woven INTO the lo column (a standalone guard column
    # would be pruned by Catalyst and never evaluate): lo itself
    # raises when the span can wrap. Compared in DOUBLE -- a span
    # near 2^63 would overflow the very BIGINT subtraction that
    # measures it; the double compare can never wrap and is exact
    # enough for an order-of-magnitude tripwire. Under ANSI mode the
    # quantize multiply would eventually fail anyway, but mid-scan of
    # a 100 TB table with an opaque ARITHMETIC_OVERFLOW; this fails
    # in the 1-row stats stage with an actionable message, and is the
    # ONLY protection when a deployment disables ANSI.
    span_cap = float(1 << (63 - bits))
    guarded_lo = [
        F.when(
            (
                F.col(f"__hi_{c}").cast("double")
                - F.col(f"__rawlo_{c}").cast("double")
                + 1.0
            )
            > span_cap,
            F.raise_error(
                F.lit(
                    f"zorder: span of column '{c}' exceeds 2^(63-{bits}) "
                    "-- (col - lo) * 2^bits would wrap BIGINT and emit "
                    "garbage z-values; reduce bits or pre-scale the column"
                )
            ).cast("long"),
        )
        .otherwise(F.col(f"__rawlo_{c}").cast("long"))
        .alias(f"__lo_{c}")
        for c in cols
    ]
    stats = df.agg(*aggs).select(
        *guarded_lo, *[f"__hi_{c}" for c in cols]
    )
    joined = df.crossJoin(F.broadcast(stats))
    qcols = [quantize(c, f"__lo_{c}", f"__hi_{c}", bits) for c in cols]
    return joined.withColumn(out, interleave(qcols, bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def zorder_write_layout(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """The write-side plan: range-partition by z-value so each output
    file covers one contiguous Morton range (callers chain
    ``.write.parquet``). Kept separate from the stats query so the
    shuffle is only paid on the actual write path."""
    z = with_zorder(df, cols, bits)
    return z.repartitionByRange("zval")


def compaction_plan(
    df: DataFrame, partition_cols: list[str], target_rows: int
) -> DataFrame:
    """Small-file compaction planner: per logical partition, the row
    count and how many target-size files a compacting rewrite should
    produce (``ceil(n_rows / target_rows)``).

    The small-file problem is THE silent killer of lake scans: a
    100 TB table accreted from streaming micro-batches easily holds
    millions of KB-sized files, and scan cost becomes file-open cost.
    The plan is one partial-combine aggregation (counts only — no data
    movement); :func:`compact_write` executes it.
    """
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive; got {target_rows}")
    return (
        df.groupBy(*partition_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            *partition_cols,
            "n_rows",
            F.expr(f"(n_rows + {target_rows - 1}) div {target_rows}").alias(
                "n_files"
            ),
        )
    )


def compact_write(
    df: DataFrame,
    partition_cols: list[str],
    target_rows: int,
    key_col: str,
    salt: str = "compact:v1",
) -> DataFrame:
    """Execute a compaction plan: spread each logical partition's rows
    across its planned file count via a deterministic hash bucket, then
    shuffle once on (partition, bucket) so each output task writes one
    target-size file. Callers chain ``.write.partitionBy(*partition_cols)``.

    The bucket is md5-derived (retry- and engine-stable), NOT round-
    robin — a retried task reproduces the same file contents, which
    exactly-once sinks require.
    """
    from configdrivendatapipeline_spark.llm.sampling import hash_bucket

    plan = compaction_plan(df, partition_cols, target_rows).select(
        *partition_cols, "n_files"
    )
    out = df.join(F.broadcast(plan), partition_cols)
    big = hash_bucket(F.col(key_col), salt, 1 << 30)
    out = out.withColumn("file_bucket", big % F.col("n_files")).drop("n_files")
    return out.repartition(*[F.col(c) for c in partition_cols], F.col("file_bucket"))
