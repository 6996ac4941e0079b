"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Headline set: the flagship pricing summary plus one representative
query per major SURVEY.md §2 family that exists in the registry.
Timing excludes Spark session startup and includes a warm-up of the
parquet footers; each query is executed once via a count-style action
that forces the full plan without driver materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from configdrivendatapipeline_spark.queries import registry
from configdrivendatapipeline_spark.session import get_spark

# Ordered preference — first N that exist in the registry are run.
HEADLINE = [
    "agg_groupby",
    "join_multiway_star",
    "win_topk_per_group",
    "agg_count_distinct",
    "sort_multi",
    "llm_exact_dedup",
    "llm_cosine_topk",
    "llm_minhash_dedup",
    "stream_tumbling",
    "val_summary",
    "enr_scd2",
    "fn_string",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cddp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = [n for n in HEADLINE if n in reg] or sorted(reg)[:8]

    # Warm-up: run every headline plan once at the smallest SF so
    # whole-stage-codegen JIT cost isn't charged to the measurement
    # (plan shape, not data volume, drives codegen).
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in names:
        try:
            reg[name].build(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # Median-of-3 per query: single-shot timings on this box swing
    # ±60% on the shuffle-heavy queries (JIT/GC noise — identical code
    # measured 9.6 s..15.6 s total across runs in round 4), and the
    # median of three independent executions sits reliably inside the
    # steady-state band. Runs are interleaved (pass over all queries,
    # three passes) so one GC pause can't poison one query's all three.
    runs: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(3):
        for name in names:
            t0 = time.monotonic()
            # noop write executes the complete plan on the executors
            # without collecting results to the driver.
            reg[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(time.monotonic() - t0)
    timings = {name: round(sorted(ts)[1], 3) for name, ts in runs.items()}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
