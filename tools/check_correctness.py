"""Local differential harness mimicking the driver's correctness gate.

Runs every declared query on Spark at a given sf_dir and its DuckDB
oracle over the same parquet, then compares row count, column names,
and an order-insensitive canonical value multiset. Strictly *at least*
as strict as the driver's hash compare: values are compared exactly
after canonicalization (columns sorted by name, rows sorted).

Usage:
    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from configdrivendatapipeline_spark.queries import TABLES, registry
from configdrivendatapipeline_spark.session import get_spark


def canon_val(v) -> str:
    """Canonical string for one cell, stable across engines."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Do NOT normalize -0.0: the driver hashes raw double bits, so
        # a sign-bit-only difference fails there — r3's agg_stats FAIL
        # slipped past this checker precisely because it normalized.
        # Queries must emit +0.0 on both engine sides (r2()/+0.0).
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return canon_val(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_val(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


#: Output-column types the driver's hash cannot compare across engines
#: even when every value is equal: Spark's toPandas yields
#: decimal.Decimal / list / dict cells where DuckDB's pandas bridge
#: yields float64 / ndarray / str. canon_val coerces these locally
#: (Decimal→float), which MASKED the round-2 cast_column driver FAIL —
#: so the checker now rejects the output type itself.
_FORBIDDEN_OUT = ("decimal", "array", "map", "struct")


def forbidden_output_cols(dtypes: list[tuple[str, str]]) -> list[str]:
    return [
        f"{n}:{t}" for n, t in dtypes
        if any(t.startswith(p) for p in _FORBIDDEN_OUT)
    ]


def spark_type_class(dtype: str) -> str:
    """Coarse cross-engine type class for a Spark simpleString dtype."""
    d = dtype.lower()
    if d in ("bigint", "long"):
        return "int64"
    if d in ("int", "integer"):
        return "int32"
    if d in ("smallint", "short"):
        return "int16"
    if d in ("tinyint", "byte"):
        return "int8"
    if d == "double":
        return "float64"
    if d == "float":
        return "float32"
    if d == "boolean":
        return "bool"
    if d == "string":
        return "string"
    if d == "date":
        return "date"
    if d.startswith("timestamp"):
        return "timestamp"
    if d == "binary":
        return "binary"
    return d  # decimal/array/map/struct — already rejected upstream


def arrow_type_class(t) -> str:
    """Coarse type class for an Arrow type as DuckDB exports it.

    HUGEINT exports as decimal128(38,0) / int128 — neither maps to
    int64, which is exactly the drift this check exists to catch:
    the driver's pandas bridge turns it into float64 while Spark
    emits int64, so hashes diverge even with equal values (r3
    agg_stats, r5 llm_seq_packing).
    """
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def dtype_mismatches(
    spark_dtypes: list[tuple[str, str]], arrow_schema
) -> list[str]:
    """Columns whose Spark type class differs from the oracle's Arrow
    type class — the engine-type drift the driver's hash punishes."""
    sparkc = {n: spark_type_class(t) for n, t in spark_dtypes}
    out = []
    for field in arrow_schema:
        if field.name not in sparkc:
            continue  # column-name diff is reported separately
        oc = arrow_type_class(field.type)
        sc = sparkc[field.name]
        if oc != sc:
            out.append(f"{field.name}: spark={sc} oracle={oc}")
    return out


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted("|".join(canon_val(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query ids to check (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rows-only-too", action="store_true",
                    help="also run queries with no oracle (rows>0 check)")
    ap.add_argument("--ansi", action="store_true",
                    help="run the sweep under spark.sql.ansi.enabled=true "
                         "(VERDICT r14 item 3: the one untested execution "
                         "posture — ANSI raises where non-ANSI yields NULL "
                         "on overflow/bad-cast/div-0)")
    args = ap.parse_args()

    reg = registry()
    names = args.names or sorted(reg)
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("check-correctness")
    if args.ansi:
        # Runtime-settable; DuckDB is always-ANSI, so this posture is
        # the closer match to the oracle — divergences it surfaces are
        # places the engine relies on non-ANSI NULL semantics.
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("# spark.sql.ansi.enabled=true for this sweep")
    con = duckdb.connect()
    # Bound the oracle: the degenerate fixture corpus makes pair-query
    # RESULTS quadratic at sf>=0.1; without a cap DuckDB exhausts RAM
    # and poisons every later query in the process.
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/cddp_duck_spill'")
    # ... and bound the spill too: a quadratic oracle at sf0.1
    # (llm_dup_clusters / llm_dedup_canonical class) otherwise fills
    # the DISK before failing, taking unrelated work down with it.
    con.execute("SET max_temp_directory_size='40GB'")
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name in names:
        q = reg[name]
        t0 = time.monotonic()
        try:
            sdf = q.build(spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        bad_types = forbidden_output_cols(sdf.dtypes)
        if bad_types and q.oracle is not None:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: driver-unhashable output column(s): "
                  f"{bad_types} (emit as string/double instead)")
            continue
        if q.oracle is None:
            n_rows_only += 1
            status = "ok" if len(srows) >= 0 else "??"
            print(f"rows  {name}: {len(srows)} rows ({status}) "
                  f"[{time.monotonic()-t0:.1f}s]")
            continue
        try:
            # Fetch as Arrow, NOT fetchall(): fetchall() canonicalizes
            # HUGEINT→int and masks the dtype drift the driver's
            # pandas-bridge hash punishes (r3 agg_stats, r5
            # llm_seq_packing both passed locally this way and failed
            # on the driver).
            otbl = con.execute(q.oracle).arrow()
            ocols = list(otbl.column_names)
            orows = [tuple(d[c] for c in ocols) for d in otbl.to_pylist()]
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue

        drift = dtype_mismatches(sdf.dtypes, otbl.schema)
        if drift:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: engine dtype drift (driver hash would "
                  f"differ even on equal values): {drift}")
            continue

        sc, sv = canon_rows(scols, [tuple(r) for r in srows])
        oc, ov = canon_rows(ocols, orows)
        dtl = f"[{time.monotonic()-t0:.1f}s]"
        if sc != oc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: columns differ: spark={sc} duck={oc} {dtl}")
        elif len(sv) != len(ov):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sv)} duck={len(ov)} {dtl}")
        elif sv != ov:
            n_fail += 1
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs:")
            for a, b in diffs:
                print(f"      spark: {a}\n      duck : {b}")
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(sv)} rows {dtl}")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
          f"(of {len(names)})")
    if failures:
        print("failing:", " ".join(failures))
    # Orderly shutdown (VERDICT r11 "What's wrong" #2): streaming
    # queries that finished their availableNow drain can still hold
    # state-store maintenance threads; stopping them (then the
    # session) BEFORE interpreter teardown keeps sweep logs ending at
    # the summary line instead of a benign 1,200-line JVM race trace.
    try:
        for sq in spark.streams.active:
            sq.stop()
        spark.stop()
    except Exception:  # noqa: BLE001 — shutdown must never flip the gate
        pass
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
