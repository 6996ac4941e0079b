"""Plan lint: sweep EVERY declared query's physical plan for the
antipatterns that kill 100 TB jobs, not just the handful pinned in
tests/test_plans.py.

Flags:
- CartesianProduct          (non-broadcast cross product)
- BatchEvalPython           (row-at-a-time Python UDF in the plan)
- global Window             (Window with an empty PARTITION BY over a
                             non-constant row count — single-partition
                             bottleneck; known-bounded frames are
                             allowlisted with justification)

Usage: python tools/plan_lint.py [--sf DIR] [names...]
Exit 1 if anything outside the allowlist is flagged.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: (query, pattern) pairs that are EXPECTED, each with a reason.
ALLOW = {
    # §2.3 contract op IS a cross join (bounded demonstrator).
    ("join_cross", "CartesianProduct"),
    # §2.12 contract ops ARE the row-Python UDF/UDTF demonstrators.
    ("udf_python", "BatchEvalPython"),
    ("udtf_python", "BatchEvalPython"),
    # the polymorphic-analyze UDTF demonstrator is likewise a
    # deliberate row-Python surface (§2.12 family).
    ("udtf_analyze", "BatchEvalPython"),
    # exact-ANN baselines broadcast a ≤8-row probe/centroid side; the
    # "cartesian" is bounded by that constant side.
    ("llm_cosine_topk", "CartesianProduct"),
    ("llm_knn_ivf", "CartesianProduct"),
    ("llm_knn_ivf_trained", "CartesianProduct"),
    ("llm_kmeans", "CartesianProduct"),
    # global windows over provably tiny frames:
    # val_skew ranks AFTER a top-k TakeOrdered (≤ k rows).
    ("val_skew", "GLOBAL_WINDOW"),
    # win_ntile/percent_rank two-pass rewrites window over per-group
    # AGGREGATES (≤ n_groups rows), not data rows.
    ("win_ntile", "GLOBAL_WINDOW"),
    ("win_percent_rank", "GLOBAL_WINDOW"),
    ("win_cume_dist", "GLOBAL_WINDOW"),
    # sort_multi ranks a LIMIT-100 frame (bounded by the limit).
    ("sort_multi", "GLOBAL_WINDOW"),
    # val_drift's global totals run over per-bin aggregates
    # (≤ n_bins rows, documented "bounded global window totals").
    ("val_drift", "GLOBAL_WINDOW"),
    # agg_rfm's quintile ranks window over the customer DIMENSION
    # aggregate (dimension-sized, not fact-sized); the docstring
    # points corpus-scaled entities at the win_ntile rewrite.
    ("agg_rfm", "GLOBAL_WINDOW"),
    # budget_select's two global windows run over per-QUALITY band
    # aggregates (≤ 101 rows — score domain) and per-shard offsets
    # (≤ 256 rows — md5 two-hex-char domain); the per-doc cumsum is
    # sharded 256-way (llm/sampling.py budget_select) so NO
    # corpus-sized frame ever routes through one window task.
    ("llm_budget_select", "GLOBAL_WINDOW"),
    # pipeline_budget runs budget_select through the YAML compiler —
    # the same two bounded windows (≤101 bands, ≤256 shard offsets).
    ("pipeline_budget", "GLOBAL_WINDOW"),
    # the outage-island window runs over MISSING calendar hours —
    # bounded by the corpus time span (8.8k rows/year), never data
    # volume.
    ("val_outage_windows", "GLOBAL_WINDOW"),
    # vocab-coverage ranks AFTER a LIMIT-100 TakeOrdered (≤100 rows).
    ("llm_vocab_coverage", "GLOBAL_WINDOW"),
    # skyline's dominance threshold windows over per-BUCKET maxima
    # (≤257 rows — fixed 256-bucket grid), never over points.
    ("agg_skyline", "GLOBAL_WINDOW"),
    # pipeline_pareto runs the same skyline op through the YAML
    # compiler — identical bounded bucket-maxima window.
    ("pipeline_pareto", "GLOBAL_WINDOW"),
}

#: For allowlisted GLOBAL_WINDOW queries: the expected NUMBER of
#: distinct global window specs in the plan. A new unpartitioned
#: window sneaking into an already-allowed query must re-justify
#: itself here instead of hiding behind the existing exemption.
#: Counts are per Window OPERATOR NODE in the simple-plan tree (a
#: bounded subtree Catalyst inlines into N branches counts N times —
#: audited per query below), so any NEW unpartitioned window strictly
#: increases the count and must re-justify here.
ALLOW_GLOBAL_WINDOW_MAX = {
    "val_skew": 1,
    "win_ntile": 2,
    "win_percent_rank": 1,
    "win_cume_dist": 1,
    "sort_multi": 1,
    "val_drift": 2,
    "agg_rfm": 4,
    # budget_select's TWO bounded windows (≤101 band rows, ≤256 shard
    # offsets) each appear in 2 plan branches → 4 nodes.
    "llm_budget_select": 4,
    "pipeline_budget": 4,
    "val_outage_windows": 1,
    "llm_vocab_coverage": 2,
    # skyline's ONE ≤257-row bucket-threshold window subtree is
    # inlined into 3 branches (dominated-check vs both union arms).
    "agg_skyline": 3,
    "pipeline_pareto": 3,
}


def lint_plan(name: str, plan: str, window_plan: str | None = None) -> list[str]:
    """Scan one query's plan text. ``window_plan`` (default: ``plan``)
    is the text used for GLOBAL_WINDOW counting — callers that
    concatenate multiple explain renderings must pass a SINGLE
    rendering here, or every window double-counts."""
    hits = []
    if "CartesianProduct" in plan and (name, "CartesianProduct") not in ALLOW:
        hits.append("CartesianProduct")
    if "BatchEvalPython" in plan and (name, "BatchEvalPython") not in ALLOW:
        hits.append("BatchEvalPython")
    # windowspecdefinition(part..., ord ASC/DESC ..., frame): a spec
    # whose FIRST argument is already an ordered expr (ASC/DESC) or
    # the frame itself has NO partition columns — every row routes
    # through one task.
    import re

    # Count per Window OPERATOR NODE (one tree line per node in the
    # simple rendering): within a node, strip Catalyst expr ids
    # (#123L) and dedup — N window functions sharing one spec are ONE
    # window — but two distinct Window nodes each count even when
    # their specs are textually identical after id-stripping, so a
    # second unpartitioned window can never hide behind an existing
    # exemption (a plan-wide dedup collapsed exactly that case).
    n_global = 0
    for line in (plan if window_plan is None else window_plan).splitlines():
        if "windowspecdefinition(" not in line:
            continue
        for m in {re.sub(r"#\d+L?", "#", s) for s in _iter_specs(line)}:
            first = m.split(",", 1)[0]
            if (
                "ASC" in first
                or "DESC" in first
                or first.strip().startswith("specifiedwindowframe")
            ):
                n_global += 1
    if n_global:
        if (name, "GLOBAL_WINDOW") not in ALLOW:
            hits.append("GLOBAL_WINDOW")
        elif n_global > ALLOW_GLOBAL_WINDOW_MAX.get(name, n_global):
            hits.append(
                f"GLOBAL_WINDOW x{n_global} > allowed "
                f"{ALLOW_GLOBAL_WINDOW_MAX[name]}"
            )
    return hits


def _iter_specs(plan: str):
    """Yield the argument text of each windowspecdefinition(...)."""
    key = "windowspecdefinition("
    start = 0
    while True:
        i = plan.find(key, start)
        if i < 0:
            return
        j, depth = i + len(key), 1
        while j < len(plan) and depth:
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        yield plan[i + len(key) : j - 1]
        start = j


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from configdrivendatapipeline_spark.queries import registry
    from configdrivendatapipeline_spark.session import get_spark

    reg = registry()
    names = args.names or list(reg)
    spark = get_spark("plan-lint", shuffle_partitions=8)
    flagged: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            df = reg[name].build(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            simple = io.StringIO()
            with redirect_stdout(simple):
                df.explain()
            hits = lint_plan(
                name,
                buf.getvalue() + "\n" + simple.getvalue(),
                window_plan=simple.getvalue(),
            )
            if hits:
                flagged[name] = hits
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors[name] = str(e).splitlines()[0][:160]
    for name, hits in sorted(flagged.items()):
        print(f"FLAG  {name}: {', '.join(hits)}")
    for name, err in sorted(errors.items()):
        print(f"ERR   {name}: {err}")
    print(f"{len(flagged)} flagged, {len(errors)} errors (of {len(names)})")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
