"""Diff two timing-census jsonl runs and flag regressions.

The census regression rule (SCALING.md, round-9): anything NOT in
the explained tail that climbs into it is a regression. This tool
makes the rule mechanical: flag every id whose Spark-side seconds
grew more than ``--ratio`` (default 2x) between runs, unless the id
is in the explained tail (each entry there carries a written cost
explanation in SCALING.md). Sub-second timings are scheduler noise,
so only ids whose NEW time is at least ``--floor`` seconds (default
2 s) can be flagged; ids present in only one run are listed
informationally.

Usage: python tools/census_diff.py OLD.jsonl NEW.jsonl [--ratio 2] [--floor 2]
Exit 1 when any regression is flagged, 0 otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys

#: ids with a written cost explanation in SCALING.md ("Round-9
#: Spark-side timing census" + "Round-10 tail annotations") — volume
#: or iteration-count bound, not plan defects. Additions here REQUIRE
#: a matching SCALING.md entry.
EXPLAINED_TAIL = {
    "llm_dup_clusters",
    "llm_cluster_sizes",
    "llm_dedup_canonical",
    "llm_jaccard_neardup",
    "agg_triangle_count",
    "llm_ngram_jaccard",
    "pipeline_contrastive",
    "pipeline_knn",
    "llm_triplets",
    "llm_dup_pagerank",
    "llm_hard_negatives",
    "pipeline_dedup_reuse",  # by construction ~1x the edge build the top-3 pay
    "sql_recursive",  # fixed-point iteration rounds (r9 census note)
    "llm_embed_neardup",  # capped-bucket pair volume (r9 scale probe)
    # streaming ids pay AvailableNow micro-batch drains (fixture
    # staging + state store), not plan cost:
    "stream_stream_join",
    "stream_stream_left_join",
    "stream_checkpoint_resume",
    "pipeline_stream_join",
}


def load(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            out[r["name"]] = r
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--floor", type=float, default=2.0)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    flagged, explained_grew, only = [], [], []
    for name, r in sorted(new.items()):
        if "sec" not in r:
            flagged.append((name, None, None, f"errored: {r.get('err')}"))
            continue
        o = old.get(name)
        if o is None or "sec" not in o:
            only.append((name, r["sec"], "new in this run"))
            continue
        if r["sec"] >= args.floor and r["sec"] > o["sec"] * args.ratio:
            row = (name, o["sec"], r["sec"], f"{r['sec'] / max(o['sec'], 0.01):.1f}x")
            (explained_grew if name in EXPLAINED_TAIL else flagged).append(row)
    for name in sorted(set(old) - set(new)):
        only.append((name, old[name].get("sec"), "missing from new run"))

    for name, sec, note in only:
        print(f"info  {name}: {sec} ({note})")
    for name, a, b, note in explained_grew:
        print(f"grew  {name}: {a} -> {b} s ({note}; explained tail — "
              "re-check its SCALING.md explanation still holds)")
    for name, a, b, note in flagged:
        print(f"FLAG  {name}: {a} -> {b} s ({note})")
    tot_old = sum(r["sec"] for r in old.values() if "sec" in r)
    tot_new = sum(r["sec"] for r in new.values() if "sec" in r)
    print(f"total: {tot_old:.0f} s ({len(old)} ids) -> "
          f"{tot_new:.0f} s ({len(new)} ids); "
          f"{len(flagged)} flagged, {len(explained_grew)} explained-grew")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
