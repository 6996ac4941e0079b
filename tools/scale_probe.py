"""Scale probe: run headline queries at sf0.1 AND a 5x key-offset
replication of it, in one session, and report the wall-clock ratio.

The point is evidence for the 100 TB claim that local benchmarks
can't give directly: a plan whose cost is dominated by per-row work
scales ~linearly (ratio ≈ 5 minus amortized fixed overhead); a plan
hiding something quadratic or driver-bound blows past it. Staged
under /tmp (driver fixtures are read-only); replicas offset every key
column so join fan-outs stay EXACTLY 1:1 per replica — the dataset is
5x the rows with identical per-key selectivity, not 5x the skew.

Usage: python tools/scale_probe.py [--factor 5] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"

#: key columns to offset per replica (FKs move together, so every
#: join keeps its exact base-data fan-out inside each replica).
OFFSETS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "nation": {},
    "region": {},
}

#: FK domains for --fresh-keys: every column in a domain gets the SAME
#: per-replica offset (joins keep their exact base fan-out), and that
#: offset is minted from the domain's actual max key — round_up(max+1,
#: 1000) — instead of the fixed 1M/10M constants above. The round-up
#: keeps %10 / %100 filter classes intact per replica. VERDICT r14
#: item 4: the fixed 10M offset is the SAME constant enr_merge_upsert
#: uses to mint its insert keys in-query (o_orderkey + 10000000), so
#: replica-1's table keys collided with replica-0's minted update keys
#: and the validate_unique guard (correctly) raised. Max-key offsets
#: are ~150k at sf0.1 — far below any in-query mint constant — so the
#: unique-key family probes for real instead of being excluded.
KEY_DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey"),
                ("events", "user_id")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventkey": [("events", "event_id")],
    "dockey": [("documents", "doc_id"), ("embeddings", "vec_id")],
}


def fresh_key_offsets(spark) -> dict[str, dict[str, int]]:
    """OFFSETS-shaped map with per-domain offsets minted from the
    data: round_up(max(key)+1, 1000) over every column in the domain."""
    from pyspark.sql import functions as F

    out: dict[str, dict[str, int]] = {t: {} for t in OFFSETS}
    for cols in KEY_DOMAINS.values():
        dom_max = 0
        present = []
        for table, col in cols:
            src = f"{BASE_SF}/{table}.parquet"
            if not os.path.exists(src):
                continue
            m = spark.read.parquet(src).agg(F.max(col)).collect()[0][0]
            dom_max = max(dom_max, int(m if m is not None else 0))
            present.append((table, col))
        step = ((dom_max + 1 + 999) // 1000) * 1000
        for table, col in present:
            out[table][col] = step
    return out

DEFAULT_QUERIES = [
    "agg_groupby",
    "join_multiway_star",
    "agg_count_distinct",
    "llm_exact_dedup",
    "llm_cosine_topk",
    "llm_unigram_lm",
    "join_bloom",
    "layout_zorder",
    "win_pareto",
    "enr_cdc_apply",
]


def stage(spark, factor: int, fresh_keys: bool = False,
          salt_docs: bool = False, salt_vectors: bool = False) -> str:
    from pyspark.sql import functions as F

    ident = (f"{BASE_SF}:{factor}:{fresh_keys}:{salt_docs}:"
             f"{salt_vectors}:"
             f"{os.stat(BASE_SF + '/orders.parquet').st_mtime_ns}")
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), "cddp_scale", tag)
    marker = out + ".staged"
    if os.path.exists(marker):
        return out
    offsets = fresh_key_offsets(spark) if fresh_keys else OFFSETS
    emb_dim = 0
    if salt_vectors:
        emb_dim = len(
            spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
            .limit(1)
            .collect()[0]["embedding"]
        )
    for table, offs in offsets.items():
        src = f"{BASE_SF}/{table}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if offs:
            parts = []
            for i in range(factor):
                rep = df
                for col, step in offs.items():
                    rep = rep.withColumn(
                        col, (F.col(col) + F.lit(i * step)).cast("long")
                    )
                if salt_docs and table == "documents" and i > 0:
                    # Per-replica token salt: replicas share NO
                    # vocabulary, so cross-replica Jaccard is 0 and a
                    # duplicate-heavy corpus replicates with its pair
                    # table and cluster structure scaling EXACTLY
                    # k× (the plain key-offset replica keeps the text
                    # identical, so near-dup pair OUTPUT grows ~k² and
                    # the probe would measure result volume, not plan
                    # efficiency — the documented quadratic-pair
                    # exclusion class this mode exists to close).
                    rep = rep.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split("text", " "),
                                lambda t, i=i: F.concat(t, F.lit(f"~{i}")),
                            ),
                            " ",
                        ),
                    )
                if salt_vectors and table == "embeddings" and i > 0:
                    # Per-replica cyclic rotation of the embedding
                    # array — the EMBEDDING analogue of the token
                    # salt above. One permutation applied to every
                    # vector of a replica preserves all within-replica
                    # dot products and norms EXACTLY (the neighbor
                    # structure is isomorphic to base), while rotated
                    # replicas hash to unrelated hyperplane buckets.
                    # Plain key-offset replication keeps the VECTORS
                    # identical, so every LSH bucket concentrates k
                    # copies of its members and candidate-pair volume
                    # grows ~k² — the probe then measures duplicate-
                    # corpus result volume, not plan efficiency
                    # (r17: pipeline_contrastive 111x at x25 under
                    # plain replication; the quadratic-pair exclusion
                    # class, vector edition).
                    d = i % emb_dim
                    if d:
                        rep = rep.withColumn(
                            "embedding",
                            F.concat(
                                F.slice("embedding", d + 1, emb_dim - d),
                                F.slice("embedding", 1, d),
                            ),
                        )
                parts.append(rep)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
        else:
            big = df  # dims shared across replicas
        big.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    open(marker, "w").close()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=5)
    ap.add_argument("--fresh-keys", action="store_true",
                    help="mint per-replica key offsets from max(key)+1 "
                         "instead of the fixed 1M/10M constants, so "
                         "queries that mint keys in-query (merge_upsert's "
                         "+10M inserts) replicate without key collisions")
    ap.add_argument("--time-build", action="store_true",
                    help="include build() in the timed window (for "
                         "eager builders: streaming drains, "
                         "write-then-read-back sinks)")
    ap.add_argument("--salt-vectors", action="store_true",
                    help="cyclically rotate each replica's embedding "
                         "arrays so LSH buckets spread instead of "
                         "concentrating k identical copies — the "
                         "honest replication mode for the embedding-"
                         "similarity family (see stage())")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from configdrivendatapipeline_spark.queries import registry
    from configdrivendatapipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    reg = registry()
    names = args.names or DEFAULT_QUERIES
    scaled = stage(spark, args.factor, fresh_keys=args.fresh_keys,
                   salt_vectors=args.salt_vectors)

    def run(name: str, sf_dir: str) -> float:
        # Default protocol times the ACTION only (plan build excluded:
        # codegen/listing amortize at scale). --time-build includes
        # build(), for builders that do their real work eagerly —
        # streaming drains, write-then-read-back sinks — where the
        # action-only timing measures just the cheap read-back.
        if args.time_build:
            t0 = time.monotonic()
            reg[name].build(spark, sf_dir).count()
            return time.monotonic() - t0
        df = reg[name].build(spark, sf_dir)
        t0 = time.monotonic()
        df.count()
        return time.monotonic() - t0

    print(f"{'query':24s} {'sf0.1':>8s} {f'x{args.factor}':>8s} {'ratio':>6s}")
    errored = 0
    for name in names:
        # Per-id isolation: one id whose semantics reject replication
        # (e.g. a uniqueness guard under the fixed-offset mode) must
        # not kill the rest of a long coverage wave.
        try:
            run(name, BASE_SF)  # warm (codegen, file listing)
            base = min(run(name, BASE_SF) for _ in range(2))
            big = min(run(name, scaled) for _ in range(2))
            print(f"{name:24s} {base:8.2f} {big:8.2f} {big / base:6.2f}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:120]
            print(f"{name:24s} ERROR {type(e).__name__}: {msg}", flush=True)
            errored += 1
    # r15 advice: per-id isolation must not turn an all-ERROR wave
    # (missing fixtures, broken import inside build) into a clean
    # exit — make failures machine-visible in the exit status so
    # committed probe artifacts can't silently record a broken run.
    if errored:
        print(f"{errored} id(s) errored", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
