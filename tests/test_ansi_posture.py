"""ANSI-mode parity guard (VERDICT r14 item 3, made permanent).

The round-15 full-registry sweep under ``spark.sql.ansi.enabled=true``
passed 390/390 (docs/SWEEP_r15_ansi.log) — no declared plan relies on
non-ANSI NULL-on-overflow / bad-cast / div-0 semantics. That sweep is
a once-per-round artifact; this test keeps the property from
regressing between sweeps by re-running the riskiest expression
classes under BOTH postures and asserting identical results:

- ``llm_mixture_plan`` — the r13 advice divergence class (DECIMAL
  water-filling quotient through MIN; a double detour would NULL with
  ANSI off and raise with ANSI on at magnitude),
- ``safe_cast`` — try_cast surfaces (plain CAST raises under ANSI),
- ``fn_try_arith`` — try_add/try_divide overflow/div-0 family,
- ``agg_stats`` — the dsum/davg exact-decimal money path,
- ``agg_weighted_avg`` — guarded ratio-of-sums division.
"""

from __future__ import annotations

import pytest

from configdrivendatapipeline_spark.queries import registry

RISKY = [
    "llm_mixture_plan",
    "safe_cast",
    "fn_try_arith",
    "agg_stats",
    "agg_weighted_avg",
]

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", RISKY)
def test_result_identical_under_ansi(spark, name):
    reg = registry()
    prior = spark.conf.get("spark.sql.ansi.enabled", "false")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        off = sorted(map(tuple, reg[name].build(spark, SF).collect()))
        spark.conf.set("spark.sql.ansi.enabled", "true")
        on_df = reg[name].build(spark, SF)
        on = sorted(map(tuple, on_df.collect()))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)
    assert off == on, f"{name} diverges between ANSI postures"
    assert len(on) > 0
