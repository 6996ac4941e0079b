"""Reusable analytic operators exposed to the YAML config surface.

Generic (parameterized) twins of the round-7 declared analytics
queries, so a pipeline user reaches them from config instead of
code:

- :func:`spatial_grid_pairs` — grid-bucketed within-radius
  self-pairing (the declared `join_spatial_grid` fixes a customer
  fixture; this takes any point frame).
- :func:`skyline_2d` — 2-D Pareto frontier with the bucket-prune
  distributed shape (`agg_skyline`'s plan, any (x, y) columns).
- :func:`date_dim` — conformed calendar dimension spanning a fact
  column's own date bounds (`enr_date_dim` generalized).

All three keep the 100 TB shapes of their declared twins: the
spatial join is an EQUI-join on the cell key (never a distance
theta-join), the skyline windows only over per-bucket maxima
(constant-bounded), and the calendar is bounded by the time span,
never data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spatial_grid_pairs(
    df: DataFrame,
    radius_u: int,
    id_col: str = "id",
    lat_col: str = "lat_u",
    lon_col: str = "lon_u",
    cell_u: int | None = None,
) -> DataFrame:
    """Pairs of points within ``radius_u`` (integer micro-degrees,
    planar distance) via a grid-cell equi-join: each point explodes
    into its 3×3 neighbor cells and probes the cell key, so
    candidate work is density-bounded instead of O(n²); the refine
    step is exact integer squared distance. ``cell_u`` (default:
    the radius) must be ≥ ``radius_u`` or the 3×3 neighborhood
    misses true pairs."""
    cell = int(cell_u if cell_u is not None else radius_u)
    radius = int(radius_u)
    if radius <= 0:
        raise ValueError(f"radius_u must be positive, got {radius}")
    if cell < radius:
        raise ValueError(
            f"cell_u ({cell}) must be >= radius_u ({radius}): a 3x3 "
            "cell neighborhood only covers the radius when cells are "
            "at least that wide"
        )
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("long").alias("lat_u"),
        F.col(lon_col).cast("long").alias("lon_u"),
    )
    cells = pts.select(
        "id", "lat_u", "lon_u",
        F.floor(F.col("lat_u") / float(cell)).cast("long").alias("gy"),
        F.floor(F.col("lon_u") / float(cell)).cast("long").alias("gx"),
    )
    probes = cells.select(
        F.col("id").alias("id_a"),
        F.col("lat_u").alias("lat_a"),
        F.col("lon_u").alias("lon_a"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dy -> "
                "transform(sequence(-1, 1), dx -> "
                "struct(gy + dy AS gy, gx + dx AS gx))))"
            )
        ).alias("cell"),
    ).select("id_a", "lat_a", "lon_a", "cell.gy", "cell.gx")
    j = probes.join(cells, ["gy", "gx"]).filter(F.col("id_a") < F.col("id"))
    dlat = F.col("lat_a") - F.col("lat_u")
    dlon = F.col("lon_a") - F.col("lon_u")
    return (
        j.select(
            "id_a",
            F.col("id").alias("id_b"),
            (dlat * dlat + dlon * dlon).alias("dist_sq_u"),
        )
        # Square in Python: radius² exceeds INT for any radius ≥ ~46k
        # and two int literals would overflow during constant folding.
        .filter(F.col("dist_sq_u") <= F.lit(radius * radius).cast("long"))
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keep_cols: list[str] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """2-D maximal skyline (Pareto frontier, maximize both axes)
    over integer-valued columns. Distributed shape: bucket the
    x-axis on a broadcast-derived width, window the dominance
    threshold over per-bucket y maxima only (≤ n_buckets + 1 rows),
    prune map-side via broadcast, and pay the exact pairwise check
    only on the tiny survivor set."""
    from pyspark.sql import Window

    keep = keep_cols or []
    # Materialize the point set once (lazy localCheckpoint — §3.3
    # discipline shared with similarity.banded_norms): pts feeds the
    # bucket-width aggregate AND the bucketed frame, and the survivor
    # set below feeds three references, so the untruncated static
    # plan re-evaluated the whole upstream (for agg_skyline, a
    # lineitem aggregation) 24 times. pts is the operator's working
    # set (one row per key), cand is the pruned survivor frame.
    pts = df.select(
        *keep, F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).localCheckpoint(eager=False)
    mx = pts.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"CAST(MAX(__x) div {int(n_buckets)} AS BIGINT)"),
        ).alias("bw")
    )
    b = pts.crossJoin(F.broadcast(mx)).withColumn("xb", F.expr("__x div bw"))
    bmax = b.groupBy("xb").agg(F.max("__y").alias("ymax"))
    wdesc = (
        Window.orderBy(F.col("xb").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    thr = bmax.withColumn("y_above", F.max("ymax").over(wdesc))
    cand = (
        b.join(F.broadcast(thr.select("xb", "y_above")), "xb")
        .filter(F.col("y_above").isNull() | (F.col("__y") >= F.col("y_above")))
        .select(*keep, "__x", "__y")
        .localCheckpoint(eager=False)
    )
    a = cand.alias("a")
    q = cand.alias("q")
    dominated = a.join(
        q,
        (F.col("q.__x") >= F.col("a.__x"))
        & (F.col("q.__y") >= F.col("a.__y"))
        & ((F.col("q.__x") > F.col("a.__x")) | (F.col("q.__y") > F.col("a.__y"))),
        "left_semi",
    )
    # Anti-join keys on the POINT (__x, __y) ONLY — not the keep
    # columns: (a) keep columns carry no uniqueness contract, so this
    # is still exact (any row sharing a dominated point's coordinates
    # is dominated by that point's dominator too); (b) a NULL keep
    # value in the join key would make a dominated row fail to match
    # ITSELF (NULL = NULL is not true) and leak into the frontier.
    return (
        cand.join(dominated.select("__x", "__y"), ["__x", "__y"], "left_anti")
        .select(
            *keep,
            F.col("__x").alias(x_col),
            F.col("__y").alias(y_col),
        )
    )


def date_dim(df: DataFrame, date_col: str) -> DataFrame:
    """Conformed calendar dimension spanning [min, max] of
    ``date_col``: year/quarter/month keys, ISO weekday (Spark's
    1=Sunday dayofweek normalized to ISO 1=Monday), weekend and
    month-end flags. Calendar-bounded output at any fact volume —
    materialize once, broadcast-join everywhere."""
    bounds = df.agg(
        F.min(F.col(date_col).cast("date")).alias("lo"),
        F.max(F.col(date_col).cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    return spine.select(
        F.col("d").alias("date_key"),
        F.year("d").alias("year"),
        F.quarter("d").alias("quarter"),
        F.month("d").alias("month"),
        F.dayofmonth("d").alias("day_of_month"),
        F.expr("CAST((dayofweek(d) + 5) % 7 + 1 AS INT)").alias("iso_dow"),
        F.expr("dayofweek(d) IN (1, 7)").alias("is_weekend"),
        F.date_format("d", "yyyy-MM").alias("month_key"),
        F.expr("d = last_day(d)").alias("is_month_end"),
    )
