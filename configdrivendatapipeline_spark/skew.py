"""Skew mitigation utilities (SURVEY.md §4 "config escape hatch for
extreme skew").

AQE's skew-join split handles most runtime skew; these helpers cover
the cases AQE can't: a single hot key whose *build side* must be
replicated (salted broadcast pattern), and skewed aggregations where
one key owns most rows (two-phase salted aggregate).

Both transforms are pure DataFrame rewrites — no RDDs, no driver
loops — and are exposed to YAML via the ``salted_join`` /
``salted_agg`` compiler ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side to a small side, splitting every
    hot key across ``salt`` sub-partitions.

    Big rows get a deterministic salt from a sibling column hash (or
    a hash of the whole row), small rows are replicated ``salt``
    times, and the join key becomes (key, salt): a key owning 40% of
    the table now lands on 16 reducers instead of one. Deterministic
    (hash-derived salt — stable across retries, unlike rand()).

    Only ``inner``/``left``(_outer) are legal: the small side is
    replicated, so any join type that can emit UNMATCHED small-side
    rows (right/full/right-semi/anti) would emit each of them
    ``salt`` times — silently duplicated output.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "replicating the small side would duplicate its unmatched "
            "rows under right/full/outer join types"
        )
    if salt < 1:
        # pmod(x, 0) is NULL, so every big-side salt would be NULL
        # and the equi-join would silently return ZERO rows — a
        # typoed YAML salt must fail at plan time, not empty the
        # output.
        raise ValueError(f"salted_join requires salt >= 1, got {salt}")
    if [c for c in big.columns if c != on] == []:
        # the salt is a hash of the WHOLE row; a key-only frame hashes
        # every hot-key row identically, so all of them still land on
        # ONE salt — the split silently does nothing. Refuse rather
        # than ship a no-op skew fix.
        raise ValueError(
            "salted_join cannot split a big side whose only column is "
            f"the join key {on!r}: the row-hash salt is constant per "
            "key; add a distinguishing column before salting"
        )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)).cast("int")
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_salted, [on, "__salt"], how)
    return out.drop("__salt")


#: phase-1 builder and phase-2 merger per algebraic aggregate kind.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output name → (kind, column) with kind in
    sum|count|min|max (algebraic aggregates only — they re-merge).
    Phase 1 aggregates on (keys + salt): the hot key's rows combine
    on ``salt`` different reducers; phase 2 merges the tiny partials
    on the real keys. The salt is a deterministic full-row hash —
    stable across task retries, unlike rand().
    """
    if salt < 1:
        # pmod(x, 0) is NULL: results would still merge correctly
        # (one NULL-salt group) but the two-phase split silently
        # degrades to a renamed plain aggregation — same plan-time
        # contract as salted_join.
        raise ValueError(f"salted_agg requires salt >= 1, got {salt}")
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt)).cast("int")
    )
    p1_exprs, p2_exprs = [], []
    for name, (kind, col) in aggs.items():
        try:
            build, merge = _ALGEBRAIC[kind]
        except KeyError:
            raise ValueError(
                f"salted_agg supports {sorted(_ALGEBRAIC)}, got {kind!r}"
            ) from None
        p1_exprs.append(build(col).alias(f"__p_{name}"))
        p2_exprs.append(merge(F.col(f"__p_{name}")).alias(name))
    phase1 = salted.groupBy(*keys, "__salt").agg(*p1_exprs)
    return phase1.groupBy(*keys).agg(*p2_exprs)


def skew_stats(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Key-skew diagnostic: the measurement you run BEFORE deciding
    whether a join/agg on ``key_col`` needs salting or AQE skew
    handling at all.

    Emits the top-k hottest keys with their row counts and corpus
    share in exact integer micro-units, plus ``skew_ratio_micro`` —
    each hot key's count relative to the mean rows-per-key (1e6 = a
    perfectly uniform key). One partial-combine aggregation over the
    keys, one broadcast 1-row totals frame, a rank window over the
    top-k survivors only — nothing here scales with row count except the one
    aggregate.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    # Take-ordered top-k FIRST (partition-parallel TakeOrdered — no
    # global single-partition window over every key), then rank the
    # k surviving rows; the window only ever sees top_k rows.
    hot = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(top_k)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        hot.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            F.col("key").cast("string").alias("key"),
            "n_rows",
            F.expr("(n_rows * 1000000) div total_rows").alias("share_micro"),
            # 128-bit intermediate: n_rows·n_keys·1e6 overflows BIGINT
            # once a 1e9-row hot key meets 1e8 distinct keys — and a
            # non-ANSI long multiply WRAPS silently (no error, wrong
            # ratio). DECIMAL(38,0) here / HUGEINT in the oracle keep
            # the math exact; the RESULT always fits (ratio ≤
            # n_keys·1e6 since n_rows ≤ total_rows).
            F.expr(
                "CAST((CAST(n_rows AS DECIMAL(38,0)) * n_keys * 1000000)"
                " div total_rows AS BIGINT)"
            ).alias("skew_ratio_micro"),
        )
    )
