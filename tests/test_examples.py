"""Every shipped example must VALIDATE (config-only — no Spark) AND
DRY-RUN COMPILE (full step graph against the sf0.001 fixtures, no
writes): a broken example is broken documentation, and YAML that
parses but names a missing column or mistyped op is still broken
(VERDICT r11 item 4)."""

from __future__ import annotations

import glob
import os

import pytest

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.yaml")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_validates(path):
    from configdrivendatapipeline_spark.config import load_pipeline

    cfg = load_pipeline(path)
    assert cfg.sources and cfg.steps


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_dry_run_compiles(spark, path):
    """compile_pipeline(dry_run=True) builds every step's plan
    against the real sf0.001 fixtures the examples point at — a
    broken step graph (wrong column, bad op params, type mismatch)
    fails HERE, not on a user's first real run. dry_run substitutes
    materialize with its schema-equivalent pass-through, so nothing
    is written; declared ``parameters:`` expand with their YAML
    defaults, exactly as ``cli run`` with no --param does."""
    from configdrivendatapipeline_spark.compiler import compile_pipeline
    from configdrivendatapipeline_spark.config import load_pipeline

    cfg = load_pipeline(path)
    frames = compile_pipeline(spark, cfg, dry_run=True)
    assert frames, path
    for name, df in frames.items():
        assert df.schema.fields, f"{path}: step {name} compiled to no columns"


def test_examples_exist():
    assert len(EXAMPLES) >= 8
