"""Differential tests: every declared query vs its DuckDB oracle.

This mirrors the driver's correctness gate (row count + columns +
order-insensitive canonical values) at sf0.001 for speed; the full
sf0.01 sweep runs via tools/check_correctness.py.
"""

from __future__ import annotations

import pytest

from configdrivendatapipeline_spark.queries import registry

sys_path_reg = registry()
ALL = sorted(sys_path_reg)
WITH_ORACLE = [n for n in ALL if sys_path_reg[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if sys_path_reg[n].oracle is None]


def _canon(cols, rows):
    from tools.check_correctness import canon_rows

    return canon_rows(list(cols), [tuple(r) for r in rows])


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_matches_oracle(name, spark, oracle, sf_dir):
    from tools.check_correctness import dtype_mismatches

    q = sys_path_reg[name]
    sdf = q.build(spark, sf_dir)
    scols, svals = _canon(sdf.columns, sdf.collect())
    # Arrow fetch, not fetchall(): fetchall canonicalizes HUGEINT to
    # int and masks the engine dtype drift the driver's hash punishes.
    otbl = oracle.execute(q.oracle).arrow()
    drift = dtype_mismatches(sdf.dtypes, otbl.schema)
    assert not drift, f"{name}: engine dtype drift {drift}"
    ocols = list(otbl.column_names)
    orows = [tuple(d[c] for c in ocols) for d in otbl.to_pylist()]
    ocols, ovals = _canon(ocols, orows)
    assert scols == ocols, f"{name}: column mismatch {scols} != {ocols}"
    assert len(svals) == len(ovals), f"{name}: rowcount {len(svals)} != {len(ovals)}"
    assert svals == ovals, f"{name}: value mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    q = sys_path_reg[name]
    rows = q.build(spark, sf_dir).collect()
    assert rows is not None
