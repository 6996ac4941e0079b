"""ANN/LSH-family scale probe: hyperplane-LSH candidate generation at
1x vs 25x, with bucket granularity configured FOR each corpus size.

Why scale_probe cannot probe this family honestly (r17 finding):

- Plain key-offset replication keeps VECTORS identical, so every LSH
  bucket holds k exact copies of its base members and candidate-pair
  volume grows ~k² — the probe measures duplicate-corpus result
  volume, not plan efficiency (pipeline_contrastive: 111x wall at
  x25). This is the quadratic-pair exclusion class from the near-dup
  text family (tools/cc_probe.py), vector edition; --salt-vectors
  (per-replica cyclic rotation, scale_probe.stage) removes it while
  preserving each replica's neighbor structure exactly.
- Even salted, a FIXED planes_per_table means a k×-larger corpus
  packs k× more vectors into the same 2^p buckets per table, so
  bucket density — and with it candidate volume — still grows ~k².
  That is not a plan defect either: it is the documented LSH
  contract ("size planes ~log₂ n", llm/similarity.py neardup_pairs),
  the same way IVF list counts scale ~sqrt(n). At 100 TB nobody runs
  the sf0.1 bucket count.

So this probe measures the operator AS IT WOULD BE CONFIGURED at
each scale: factor k runs with planes_per_table + ceil(log2 k)
(bucket count ~n, expected density constant, candidate volume ~k×).
It reports, per configuration:

- analytic candidate volume (sum over buckets of m·(m−1), a groupBy
  count — no pair join needed), and its per-anchor mean;
- measured wall for hard_negatives and knn_join (warm + min-of-2).

Plus the skew-cap posture: the deliberately-CONCENTRATED (unsalted)
x25 corpus — every bucket 25 exact copies deep, the duplicate-heavy
production shape — run with max_bucket, showing the documented
defense bounds the join where the uncapped form is quadratic.

Usage: python tools/ann_probe.py [--factor 25] [--base-planes 4]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"


def candidate_volume(spark, emb, n_tables: int, planes: int,
                     max_bucket: int | None = None):
    """(ordered candidate pairs, anchors) from bucket sizes alone —
    Σ m·(m−1) over (table, bucket) — linear work, no pair join."""
    from pyspark.sql import functions as F

    from configdrivendatapipeline_spark.llm.similarity import (
        _cap_buckets,
        _table_buckets,
        as_double,
    )

    v = emb.select("vec_id", as_double("embedding").alias("__v"))
    banded = v.select(
        "vec_id",
        F.posexplode(_table_buckets(F.col("__v"), n_tables, planes)).alias(
            "table_id", "bucket"
        ),
    )
    banded = _cap_buckets(banded, ["table_id", "bucket"], max_bucket)
    sizes = banded.groupBy("table_id", "bucket").agg(
        F.count(F.lit(1)).alias("m")
    )
    row = sizes.agg(
        F.sum(F.col("m") * (F.col("m") - F.lit(1))).alias("vol")
    ).collect()[0]
    n = emb.count()
    return int(row["vol"] or 0), n


def timed(fn, *args, **kwargs):
    """Warm + min-of-2 wall for fn(*args).count()."""
    fn(*args, **kwargs).count()
    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        fn(*args, **kwargs).count()
        walls.append(time.monotonic() - t0)
    return min(walls)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=25)
    ap.add_argument("--base-planes", type=int, default=4)
    ap.add_argument("--n-tables", type=int, default=6)
    ap.add_argument("--cap", type=int, default=500,
                    help="max_bucket for the concentrated-corpus "
                         "skew-cap demonstration")
    args = ap.parse_args()

    from configdrivendatapipeline_spark.llm.similarity import (
        hard_negatives,
        knn_join,
    )
    from configdrivendatapipeline_spark.session import get_spark
    from tools.scale_probe import stage

    spark = get_spark("ann-probe")
    spark.range(1_000_000).count()  # JVM warm

    scaled_planes = args.base_planes + math.ceil(math.log2(args.factor))
    salted = stage(spark, args.factor, salt_vectors=True)
    plain = stage(spark, args.factor)

    base_emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    salted_emb = spark.read.parquet(f"{salted}/embeddings.parquet")
    plain_emb = spark.read.parquet(f"{plain}/embeddings.parquet")

    rows = [
        ("x1 planes=%d" % args.base_planes, base_emb, args.base_planes, None),
        ("x%d-salted planes=%d (scaled)" % (args.factor, scaled_planes),
         salted_emb, scaled_planes, None),
        ("x%d-salted planes=%d (UNSCALED, volume only)"
         % (args.factor, args.base_planes),
         salted_emb, args.base_planes, None),
        ("x%d-plain planes=%d (CONCENTRATED, volume only)"
         % (args.factor, args.base_planes),
         plain_emb, args.base_planes, None),
        ("x%d-plain planes=%d cap=%d (skew-cap demo)"
         % (args.factor, args.base_planes, args.cap),
         plain_emb, args.base_planes, args.cap),
    ]
    print(f"{'config':48s} {'cand_pairs':>14s} {'per_anchor':>10s} "
          f"{'hardneg_s':>10s} {'knn_s':>8s}")
    for label, emb, planes, cap in rows:
        vol, n = candidate_volume(spark, emb, args.n_tables, planes, cap)
        if "volume only" in label:
            # the uncapped dense configs: the candidate join itself is
            # the k² object — report its size, don't execute it
            print(f"{label:48s} {vol:14,d} {vol / n:10.1f} "
                  f"{'—':>10s} {'—':>8s}", flush=True)
            continue
        hn = timed(hard_negatives, emb, n_tables=args.n_tables,
                   planes_per_table=planes, max_bucket=cap)
        kj = timed(knn_join, emb, k=1, n_tables=args.n_tables,
                   planes_per_table=planes, group_col="label",
                   max_bucket=cap)
        print(f"{label:48s} {vol:14,d} {vol / n:10.1f} "
              f"{hn:10.2f} {kj:8.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
