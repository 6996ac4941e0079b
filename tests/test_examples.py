"""Every shipped example must VALIDATE (config-only — no Spark): a
broken example is broken documentation."""

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


def test_examples_exist():
    assert len(EXAMPLES) >= 8
