"""Enrichment operators — "enrichment" (/root/reference/README.md:2),
SURVEY.md §2.9.

Each function is a pure DataFrame→DataFrame transform, reused by the
step compiler (`op: lookup` etc.) and the declared queries.

Scale notes: lookups broadcast the dim side (they are ADF 'Lookup'
small tables by contract); SCD2 is a single window pass partitioned
by business key (shuffles once on the key — no MERGE, no driver
loop); surrogate keys use per-key deterministic ordering, never
``monotonically_increasing_id`` (not stable across retries).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: dict[str, str],
    take: dict[str, str],
    defaults: dict[str, Any] | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Dim lookup with default-on-miss (ADF 'Lookup').

    ``on`` maps fact column → dim column; ``take`` maps output name →
    dim column; ``defaults`` fills misses.
    """
    d = dim.select(
        *[F.col(v).alias(f"__k_{k}") for k, v in on.items()],
        *[F.col(v).alias(out) for out, v in take.items()],
    )
    if broadcast:
        d = F.broadcast(d)
    cond = None
    for k in on:
        c = fact[k] == d[f"__k_{k}"]
        cond = c if cond is None else (cond & c)
    out = fact.join(d, cond, "left").drop(*[f"__k_{k}" for k in on])
    for name, default in (defaults or {}).items():
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return out


def standardize(df: DataFrame, columns: list[str]) -> DataFrame:
    """Trim + collapse inner whitespace + uppercase + blank→null."""
    for c in columns:
        df = df.withColumn(
            c,
            F.nullif(F.upper(F.regexp_replace(F.trim(F.col(c)), r"\s+", " ")), F.lit("")),
        )
    return df


def bucketize(
    df: DataFrame, column: str, bounds: list[float], labels: list[str], out: str
) -> DataFrame:
    """Value → band label: len(labels) == len(bounds) + 1.

    ``bounds`` are the right-open cut points: x < bounds[0] → labels[0],
    bounds[i-1] <= x < bounds[i] → labels[i], x >= bounds[-1] → labels[-1].
    """
    if len(labels) != len(bounds) + 1:
        raise ValueError("need len(labels) == len(bounds) + 1")
    if list(bounds) != sorted(set(bounds)):
        # out-of-order cut points don't error downstream — the first
        # matching `< bound` wins, so [10, 5] silently mis-bands every
        # value in [5, 10) into the first band
        raise ValueError(
            f"bucketize bounds must be strictly increasing; got {bounds}"
        )
    c = F.col(column)
    # NULL input → NULL band, stated first: every `c < bound` is
    # NULL-false, so without the guard missing data silently lands
    # in the TOP band via otherwise().
    expr: Column = F.when(c.isNull(), F.lit(None).cast("string"))
    expr = expr.when(c < F.lit(bounds[0]), labels[0])
    for i in range(1, len(bounds)):
        expr = expr.when(c < F.lit(bounds[i]), labels[i])
    expr = expr.otherwise(labels[-1])
    return df.withColumn(out, expr)


def surrogate_key(
    df: DataFrame, order_by: list[str], out: str = "sk", partition_by: list[str] | None = None
) -> DataFrame:
    """Deterministic surrogate key.

    With ``partition_by``: per-partition ``row_number`` over a
    deterministic order (100 TB-safe — each key group sorts locally
    after one shuffle). Without: a single global ``row_number`` —
    declared for bounded dims only (SURVEY §4: global total order is
    not a lake-scale operation).
    """
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(out, F.row_number().over(w).cast("long"))


def audit_columns(df: DataFrame, load_id: str, source_name: str) -> DataFrame:
    """Lineage columns. Fixed values from orchestration (not
    current_timestamp()) so re-runs are byte-identical."""
    return df.withColumn("_load_id", F.lit(load_id)).withColumn(
        "_source", F.lit(source_name)
    )


def scd2(
    snapshots: DataFrame,
    key: list[str],
    ts: str,
    attrs: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change/snapshot log.

    One window pass per business key ordered by ``ts``: each version
    row gets ``valid_from`` = its ts, ``valid_to`` = next version's ts
    (null = open), ``is_current`` = no later version exists.

    Two versions of one key at the SAME ``ts`` are ordered arbitrarily
    by the engine — which version is "current" could then differ
    between retries. Pass ``tiebreak_cols`` (a version/sequence
    column, like :func:`cdc_apply`'s) whenever the change log can
    carry same-instant versions; without it, determinism rests on
    ``ts`` being unique per key.
    """
    order = [F.col(ts).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key).orderBy(*order)
    nxt = F.lead(F.col(ts)).over(w)
    out = (
        snapshots.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
    if attrs is not None:
        out = out.select(*key, *attrs, "valid_from", "valid_to", "is_current")
    return out


def union_harmonize(dfs: list[DataFrame]) -> DataFrame:
    """Schema-align N sources: missing columns become nulls."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: list[str],
    update_cols: list[str] | None = None,
    validate_unique: bool = True,
) -> DataFrame:
    """MERGE INTO as a pure DataFrame rewrite (no Delta dependency):
    matched keys take the update row's values, unmatched targets pass
    through, unmatched updates insert. One full-outer join on the key
    — the SCD1 upsert pattern (ADF Copy upsert semantics).

    ``update_cols`` limits which columns the update side overwrites
    (defaults to every non-key column present on both sides).

    A literal match marker (not ``coalesce`` on data columns) decides
    which side wins, so an update row CAN set a column to NULL —
    exactly SQL MERGE's ``WHEN MATCHED THEN UPDATE SET`` semantics.
    ``validate_unique=True`` (default) fails the job if the updates
    side carries duplicate keys, which under a plain join would
    silently fan out target rows. The check is IN the plan (a keyed
    window count + ``raise_error``, spill-safe, evaluated when the
    merge actually runs) so building the step stays lazy and the
    updates input is never scanned twice; pass False to skip even
    that when uniqueness is guaranteed upstream (win_dedup_latest).
    """
    if update_cols is None:
        update_cols = [
            c for c in updates.columns if c not in key and c in target.columns
        ]
    if validate_unique:
        # The guard rides ON the first key column (always referenced
        # by the merge join, so column pruning can never drop it): a
        # free-standing guard column that is later dropped would be
        # pruned out of the plan, guard and all.
        w = Window.partitionBy(*key)
        k0 = key[0]
        k0_type = updates.schema[k0].dataType.simpleString()
        updates = updates.withColumn(
            k0,
            F.when(
                F.count(F.lit(1)).over(w) > 1,
                F.raise_error(
                    F.lit(
                        "merge_upsert: updates side has duplicate keys "
                        f"{key} — each target row would fan out; dedup "
                        "first (win_dedup_latest) or pass "
                        "validate_unique=False"
                    )
                ).cast(k0_type),
            ).otherwise(F.col(k0)),
        )
    u = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in key],
        *[F.col(c).alias(f"__u_{c}") for c in update_cols],
        F.lit(1).alias("__u_matched"),
    )
    cond = None
    for k in key:
        c = target[k] == u[f"__u_{k}"]
        cond = c if cond is None else (cond & c)
    joined = target.join(u, cond, "full_outer")
    upd = u["__u_matched"].isNotNull()
    out_cols = []
    for c in target.columns:
        if c in key:
            out_cols.append(F.coalesce(target[c], u[f"__u_{c}"]).alias(c))
        elif c in update_cols:
            # matched or insert → update side wins (NULLs included).
            out_cols.append(F.when(upd, u[f"__u_{c}"]).otherwise(target[c]).alias(c))
        else:
            out_cols.append(target[c])
    return joined.select(*out_cols)


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str,
    delete_op: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC change log with latest-wins semantics: per key,
    keep only the newest change; a delete tombstone as the newest
    change removes the key entirely.

    This is the read-side of every lakehouse CDC sink (Debezium →
    merge): one window partitioned by key (partition-parallel — the
    shuffle is on the key, exactly like the MERGE it replaces would
    shuffle), ordered by event time with explicit tie-break columns so
    two changes in the same instant resolve identically on every
    engine and retry.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("__rn")
    )


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental materialized-view maintenance for distributive
    aggregates: merge a persisted (group → counts/sums) state with the
    same aggregate computed over only the NEW rows — the update never
    rescans history, which is the entire economics of incremental ETL
    at 100 TB (a day's delta is ~0.3% of a year's table).

    Counts and sums are distributive, so merge = outer-join on the
    group key + coalesced addition; avg/stddev derive from (n, Σx,
    Σx²) the same way. One shuffle on the group key, sized by
    |state| + |delta|, not by history.
    """
    s = state.select(
        *group_cols,
        *[F.col(c).alias(f"__s_{c}") for c in [count_col, *sum_cols]],
    )
    d = delta.select(
        *group_cols,
        *[F.col(c).alias(f"__d_{c}") for c in [count_col, *sum_cols]],
    )
    merged = s.join(d, group_cols, "full_outer")
    out_cols = [F.col(c) for c in group_cols]
    for c in [count_col, *sum_cols]:
        out_cols.append(
            (
                F.coalesce(F.col(f"__s_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
        )
    return merged.select(*out_cols)


def survivorship(
    df: DataFrame,
    key_cols: list[str],
    priority_col: str,
    rules: dict[str, tuple[str, str]],
) -> DataFrame:
    """Master-data survivorship: collapse duplicate records of one
    entity into a single golden record with PER-FIELD rules — the
    record-mastering step after entity resolution (different sources
    disagree; each field picks its own winner).

    ``rules`` maps output name → (kind, column) with kind:

    - ``first_non_null``: the value from the lowest ``priority_col``
      row where the column is non-null (source trust order), ties on
      priority broken by the value itself — fully deterministic;
    - ``max`` / ``min``: extremum across all of the entity's records.

    One aggregation on the entity key. first_non_null composes from
    collect_list → array_sort → element_at over the per-entity
    variants (collect_list drops nulls by construction) — bounded by
    the duplicate-group size, never corpus-shaped, and retry-stable
    where ``first()``/``min_by`` tie-breaks are not.
    """
    aggs = []
    for out, (kind, col) in rules.items():
        if kind == "first_non_null":
            # try_element_at: an entity whose field is NULL in EVERY
            # record collects an empty array, and plain element_at
            # throws under Spark 4's default ANSI mode instead of
            # yielding the NULL survivor.
            expr = F.try_element_at(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col(col).isNotNull(),
                            F.struct(
                                F.col(priority_col).alias("p"),
                                F.col(col).alias("v"),
                            ),
                        )
                    )
                ),
                F.lit(1),
            ).getField("v")
        elif kind == "max":
            expr = F.max(col)
        elif kind == "min":
            expr = F.min(col)
        else:
            raise ValueError(
                f"survivorship supports first_non_null|max|min, got {kind!r}"
            )
        aggs.append(expr.alias(out))
    return df.groupBy(*key_cols).agg(*aggs)
