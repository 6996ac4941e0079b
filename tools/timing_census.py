"""Spark-side wall-clock census over the full query registry.

The correctness harness' per-query times fold in the DuckDB oracle,
which at some SFs dwarfs the Spark side (the four documented
quadratic-ORACLE ids most of all). This census times ONLY the Spark
plan — build + execute (count) — per registry id, so slow entries
point at engine plans, not oracle replays. Output: one JSON line per
query (name, seconds, rows) to stdout, then a sorted top-N summary
to stderr.

Usage: python tools/timing_census.py [--sf DIR] [--top 15] [names...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_markers() -> set[str]:
    """Fixture-staging markers currently on disk. Every scratch
    fixture the queries stage (doubled streaming feeds, the near-dup
    pair table, binary-file stages) lands under /tmp/cddp_stream/
    <fixture-tag>/<name> with a ``<name>.staged`` marker, so the
    marker set is the complete observable staging state."""
    return set(
        glob.glob(
            os.path.join(tempfile.gettempdir(), "cddp_stream", "*", "*.staged")
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from configdrivendatapipeline_spark.queries import registry
    from configdrivendatapipeline_spark.session import get_spark

    spark = get_spark("timing-census")
    reg = registry()
    names = args.names or list(reg)
    # Warm the session before timing anything: the first ids
    # otherwise absorb JVM/codegen warm-up, the first parquet-footer
    # reads, and Python-worker-pool startup — the round-10 census
    # diff flagged five head-of-registry ids at 2-45x purely from
    # the coverage-window rotation moving them to the front
    # (steady-state re-runs matched round 9 exactly).
    from pyspark.sql import functions as F

    spark.range(1_000_000).agg(F.sum("id")).collect()
    # Warm-up is best-effort, not a precondition: a fixture dir
    # missing either table (e.g. a --names run over a trimmed
    # fixture) must not crash the census before it starts.
    try:
        warm_tables = spark.read.parquet(f"{args.sf}/lineitem.parquet")
        warm_tables.agg(F.count(F.lit(1))).collect()
    except Exception as exc:
        print(f"warm-up skip (lineitem): {str(exc)[:120]}", file=sys.stderr)
    try:
        pdf = spark.read.parquet(f"{args.sf}/documents.parquet").limit(64)
        pdf.mapInPandas(lambda it: it, pdf.schema).count()  # pandas workers
    except Exception as exc:
        print(f"warm-up skip (documents): {str(exc)[:120]}", file=sys.stderr)
    out = []
    for name in names:
        # Snapshot the staging-marker set around each timed run: an id
        # that builds a scratch fixture inside its window (a doubled
        # streaming feed, the near-dup pair table) pays that one-off
        # build in ITS census seconds on a cold /tmp. Annotating the
        # line makes the census-vs-steady gap attributable
        # mechanically (r16 verdict item 8: stream_dedup_watermark's
        # 16 s census / 2.2 s steady needed a human to explain).
        pre_markers = _stage_markers()
        t0 = time.monotonic()
        try:
            n = reg[name].build(spark, args.sf).count()
            sec = round(time.monotonic() - t0, 2)
            rec = {"name": name, "sec": sec, "rows": n}
            staged = sorted(
                os.path.basename(m)[: -len(".staged")]
                for m in _stage_markers() - pre_markers
            )
            if staged:
                rec["cold_stage"] = staged
            out.append(rec)
            print(json.dumps(rec), flush=True)
        except Exception as exc:  # keep the census moving; report
            print(
                json.dumps({"name": name, "err": str(exc)[:200]}), flush=True
            )
    out.sort(key=lambda r: -r["sec"])
    print(f"-- top {args.top} of {len(out)} by Spark-side seconds --", file=sys.stderr)
    for r in out[: args.top]:
        print(f"{r['sec']:8.2f}s  {r['name']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
