"""Round-13 hardening pins (verdict r12 item 2 + ADVICE r12).

1. The core money-sum helpers (``_sum6``/``dsum``/``davg``) must stay
   exact and engine-identical PAST the old ~9.2e18-micro BIGINT cliff
   (~$9.2T per group at 100 TB). The r12 widening (commit 03a2655)
   removed the ``CAST(... AS BIGINT)`` from ``_sum6``; this test FAILS
   if anyone re-adds it, mirroring the skew_stats magnitude pin in
   tests/test_skew_and_streaming_cfg.py.
2. agg_trend's negative-slope div semantics: Spark ``div`` truncates
   toward zero, DuckDB ``//`` floors — the sign/abs rewrite must make
   the two engines agree on a non-exact NEGATIVE slope.
3. agg_xyz_class's ``demand_ss`` replaces the raw variance numerator
   (which passes 2^63 at lake scale); the div-by-n rescale must stay
   exact and engine-identical at the magnitudes the envelope defends.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

from configdrivendatapipeline_spark.queries import davg, dsum, odavg, odsum


#: ten rows just under decimal(18,6)'s integer capacity: the group sum
#: is ~1e19 micro-units — past the 9.223e18 BIGINT cliff the old
#: _sum6 CAST silently wrapped (Spark non-ANSI) or raised (DuckDB).
_BIG = 999_999_999_999.99
_N = 10

#: Per-row micro-units derived from the ACTUAL IEEE double (ADVICE
#: r13): the double nearest 999_999_999_999.99 is
#: 999999999999.989990234375, so each row's DECIMAL(18,6) cast yields
#: 999_999_999_999_989_990 micro-units — 10 fewer than the idealized
#: literal's 999_999_999_999_990_000. The old hardcode was right only
#: by coincidence (both integers round to the same double at ~1e19,
#: ULP ~2048); deriving keeps the pin correct if _N or _BIG change.
#: The 6-dp digit string of the exact expansion is ...989990|234375 —
#: nowhere near a tie, so HALF_UP here matches whatever half-rounding
#: either engine applies in its double→decimal cast.
_MICRO_PER_ROW = int(
    decimal.Decimal(_BIG).quantize(
        decimal.Decimal("1.000000"), rounding=decimal.ROUND_HALF_UP
    )
    * 10**6
)
_S6 = _N * _MICRO_PER_ROW
assert _MICRO_PER_ROW == 999_999_999_999_989_990  # doc of the 10-unit gap


def _expected_dsum() -> float:
    # replay dsum's exact arithmetic in Python (floats are IEEE
    # doubles; float(int) is correctly rounded, / is one IEEE div)
    cents = math.floor(float(_S6 + 5000) / 10000)
    return float(cents) / 100


def _expected_davg() -> float:
    cents = math.floor(float(_S6 * 2 + _N * 10000) / (_N * 20000))
    return float(cents) / 100


def test_money_sum_exact_past_bigint_cliff(spark):
    df = spark.range(_N).selectExpr(f"CAST({_BIG} AS DOUBLE) AS v")
    row = df.agg(dsum("v", "s"), davg("v", "a")).collect()[0]

    con = duckdb.connect()
    try:
        orow = con.execute(
            f"SELECT {odsum('v', 's')}, {odavg('v', 'a')} FROM "
            f"(SELECT CAST({_BIG} AS DOUBLE) AS v FROM range({_N}))"
        ).fetchone()
    finally:
        con.close()

    assert row["s"] == orow[0] == _expected_dsum()
    assert row["a"] == orow[1] == _expected_davg()


def test_old_bigint_cast_really_breaks_at_this_magnitude(spark):
    """The pre-r12 _sum6 tail (``CAST(FLOOR(SUM(dec6)*1e6) AS
    BIGINT)``) is genuinely broken where the widened form is exact:
    Spark non-ANSI silently NULLs (or wraps), ANSI raises, and DuckDB
    raises out-of-range — the divergent-failure mode the widening
    removed. Accept every failure shape; only a CORRECT value fails
    the test (that would mean the cliff moved and the pin is stale)."""
    want_micro = _S6
    assert want_micro > 2**63 - 1  # the scenario is past the cliff
    expr = (
        f"SELECT CAST(FLOOR(SUM(CAST(v AS DECIMAL(18,6))) * 1000000)"
        f" AS BIGINT) AS m FROM "
        f"(SELECT CAST({_BIG} AS DOUBLE) AS v FROM range({_N}))"
    )
    try:
        got = spark.sql(expr).collect()[0]["m"]
        assert got is None or got != want_micro
    except Exception as e:  # noqa: BLE001 — ANSI mode raises
        assert "OVERFLOW" in str(e).upper() or "CAST" in str(e).upper()
    con = duckdb.connect()
    try:
        with pytest.raises(Exception):
            con.execute(expr).fetchone()
    finally:
        con.close()


def test_negative_slope_div_agrees_across_engines(spark):
    """ADVICE r12: a declining, NON-exact micro-slope — num=-3,
    den=9 (e.g. points (0,2),(3,1) in micro-y: num = nΣxy−ΣxΣy =
    2·3−3·3 = −3, den = nΣx²−(Σx)² = 2·9−9 = 9). True quotient
    −333333.3…. Measured here: BOTH Spark ``div`` and DuckDB's
    integer ``//`` truncate toward zero (the ADVICE presumed DuckDB
    floors; its int128/int64 division is C-style — pinned below so a
    semantics change in either engine is caught). The sign/abs
    rewrite makes the emitted slope equal to trunc BY CONSTRUCTION
    on both engines — agreement no longer depends on either
    engine's negative-division convention."""
    num, den = -3, 9
    want = -((-num * 1_000_000) // den)  # sign·(abs div) = -333333
    got_spark = spark.sql(
        f"SELECT CAST((CASE WHEN {num} >= 0 THEN 1 ELSE -1 END)"
        f" * ((abs({num}) * 1000000) div {den}) AS BIGINT) AS s"
    ).collect()[0]["s"]
    con = duckdb.connect()
    try:
        got_duck = con.execute(
            f"SELECT CAST((CASE WHEN {num} >= 0 THEN 1 ELSE -1 END)"
            f" * ((abs({num}) * 1000000) // {den}) AS BIGINT)"
        ).fetchone()[0]
    finally:
        con.close()
    assert got_spark == got_duck == want == -333333
    # pin the raw (pre-rewrite) semantics observed today: both
    # engines truncate negative integer division toward zero — if
    # either ever switches to floor, this assert localizes it and
    # the sign/abs form above keeps the registered queries agreeing
    raw_spark = spark.sql(
        f"SELECT ({num} * 1000000) div {den} AS s"
    ).collect()[0]["s"]
    con = duckdb.connect()
    try:
        raw_duck = con.execute(
            f"SELECT (CAST({num} AS HUGEINT) * 1000000) // {den}"
        ).fetchone()[0]
    finally:
        con.close()
    assert raw_spark == -333333 and raw_duck == -333333
    # companion canary for % (same audit): both engines take the
    # DIVIDEND's sign (C-style), so hash-derived possibly-negative
    # keys (e.g. xxhash64 minhash keys mod 2^21) bucket identically
    mod_spark = spark.sql("SELECT -7 % 3 AS m").collect()[0]["m"]
    con = duckdb.connect()
    try:
        mod_duck = con.execute("SELECT -7 % 3").fetchone()[0]
    finally:
        con.close()
    assert mod_spark == mod_duck == -1  # floor-style would give +2


def test_demand_ss_exact_and_in_range_at_lake_magnitude(spark):
    """agg_xyz_class ADVICE r12: raw var_num = n·Σq² − (Σq)² passes
    2^63 under the documented envelope (monthly q ~ 1e8 over ~120
    months); demand_ss = var_num div n ≤ Σq² ≤ 1.2e18 fits BIGINT,
    is ≥ 0 (Cauchy–Schwarz) so Spark div == DuckDB //."""
    qs = [100_000_000, 1, 99_999_999, 50_000_000] * 30  # 120 months
    n = len(qs)
    sq, sqq = sum(qs), sum(q * q for q in qs)
    var_num = n * sqq - sq * sq
    assert var_num > 2**63 - 1  # the raw column really overflows
    want = var_num // n
    assert 0 <= want < 2**63  # and the rescale provably fits
    vals = ",".join(f"({q})" for q in qs)
    got_spark = spark.sql(
        f"SELECT CAST((n * sqq - sq * sq) div n AS BIGINT) AS ss FROM ("
        f"  SELECT COUNT(*) AS n,"
        f"    SUM(CAST(q AS DECIMAL(38,0))) AS sq,"
        f"    SUM(CAST(q AS DECIMAL(38,0)) * q) AS sqq"
        f"  FROM VALUES {vals} AS t(q))"
    ).collect()[0]["ss"]
    con = duckdb.connect()
    try:
        got_duck = con.execute(
            f"SELECT CAST((n * sqq - sq * sq) // n AS BIGINT) FROM ("
            f"  SELECT COUNT(*) AS n, CAST(SUM(q) AS HUGEINT) AS sq,"
            f"    SUM(CAST(q AS HUGEINT) * q) AS sqq"
            f"  FROM (SELECT unnest([{','.join(map(str, qs))}]) AS q))"
        ).fetchone()[0]
    finally:
        con.close()
    assert got_spark == got_duck == want


def test_mixture_min_quotient_stays_decimal_past_bigint(spark):
    """ADVICE r13 (mixture_plan): the water-filling MIN argument
    avail·big_w/w exceeds BIGINT for a non-constraining tiny-weight
    source; the old ``... div w`` form coerces it to BIGINT and Spark
    WRAPS it to a garbage negative (measured below — NOT the benign
    NULL-skip the advice presumed), which would then WIN the MIN.
    The shipped remainder-subtraction form keeps the quotient an
    exact integer-valued DECIMAL through the MIN, matching DuckDB's
    HUGEINT carry; the min itself provably fits BIGINT (it is the
    total planned token budget, ≤ Σ tokens_avail)."""
    rows = [(5_000_000_000_000_000_000, 1), (1_000, 1_000_000)]
    big_w = sum(w for _, w in rows)
    # row 1's true quotient passes 2^63; row 2 is the binding source
    assert rows[0][0] * big_w // rows[0][1] > 2**63 - 1
    want = min(a * big_w // w for a, w in rows)  # = 1000
    vals = ",".join(f"({a}, {w})" for a, w in rows)
    dec = f"CAST(avail AS DECIMAL(38,0)) * {big_w}"
    got_spark = spark.sql(
        f"SELECT CAST(MIN(({dec} - ({dec}) % w) / w) AS BIGINT) AS m"
        f" FROM VALUES {vals} AS t(avail, w)"
    ).collect()[0]["m"]
    con = duckdb.connect()
    try:
        got_duck = con.execute(
            f"SELECT CAST(MIN(CAST(avail AS HUGEINT) * {big_w} // w)"
            f" AS BIGINT) FROM (VALUES {vals}) t(avail, w)"
        ).fetchone()[0]
    finally:
        con.close()
    assert got_spark == got_duck == want == 1000
    # pin the failure mode the rewrite removes: the old div form
    # wraps row 1 negative and the wrapped garbage wins the MIN
    old = spark.sql(
        f"SELECT MIN({dec} div w) AS m FROM VALUES {vals} AS t(avail, w)"
    ).collect()[0]["m"]
    assert old is None or old != want  # if this fails, div got fixed
    # upstream and the decimal form is merely equivalent, not required


def test_token_scale_micro_products_exact_past_bigint(spark):
    """r13 token-scale audit: micro ratios whose numerator is a TOKEN
    count (not a row count) reach ~1e14 at 100 TB, so numerator·1e6
    passes 2^63 — Spark non-ANSI wraps silently, DuckDB raises (the
    divergent pair). The widened freq/fertility/waste/utilization
    expressions must return the exact quotient at that magnitude on
    both engines; the quotients themselves (≤ 1e6-scale ratios) fit
    BIGINT. Fails if anyone narrows the DECIMAL/HUGEINT casts back."""
    cnt, total = 20_000_000_000_000, 100_000_000_000_000  # 20% head token
    want = cnt * 1_000_000 // total
    assert cnt * 1_000_000 > 2**63 - 1  # the scenario is past the cliff
    got_spark = spark.sql(
        f"SELECT (CAST({cnt} AS DECIMAL(38,0)) * 1000000) div {total} AS f"
    ).collect()[0]["f"]
    con = duckdb.connect()
    try:
        got_duck = con.execute(
            f"SELECT CAST((CAST({cnt} AS HUGEINT) * 1000000) // {total}"
            f" AS BIGINT)"
        ).fetchone()[0]
    finally:
        con.close()
    assert got_spark == got_duck == want == 200_000
    # and the narrow form genuinely fails there, divergently
    try:
        wrapped = spark.sql(
            f"SELECT ({cnt} * 1000000) div {total} AS f"
        ).collect()[0]["f"]
        assert wrapped is None or wrapped != want
    except Exception as e:  # noqa: BLE001 — ANSI raises
        assert "OVERFLOW" in str(e).upper()
    con = duckdb.connect()
    try:
        with pytest.raises(Exception):
            con.execute(
                f"SELECT (CAST({cnt} AS BIGINT) * 1000000) // {total}"
            ).fetchone()
    finally:
        con.close()


def test_money_sum_exact_past_cliff_under_ansi(spark):
    """Round-15 ANSI posture, magnitude edition: the sf0.01 ANSI
    sweep can't reach the ~1e19-micro regime, so pin it directly —
    the widened dsum/davg path must stay exact (and NOT raise) under
    spark.sql.ansi.enabled=true at the same past-BIGINT-cliff
    magnitude the non-ANSI test covers. The decimal SUM's widened
    precision (38,6) holds ~1e19 micro-units with 12 digits to
    spare, so ANSI has nothing to raise on; a re-introduced BIGINT
    cast would turn this test into an ANSI Arithmetic exception."""
    prior = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        df = spark.range(_N).selectExpr(f"CAST({_BIG} AS DOUBLE) AS v")
        row = df.agg(dsum("v", "s"), davg("v", "a")).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)
    assert row["s"] == _expected_dsum()
    assert row["a"] == _expected_davg()
