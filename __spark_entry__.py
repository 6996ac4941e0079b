"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real inventory lives in
:mod:`configdrivendatapipeline_spark.queries` — one DeclaredQuery per
SURVEY.md §2 operator; this module just adapts it to the driver's
shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from configdrivendatapipeline_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return registry()["agg_groupby"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented SURVEY.md §2 operator."""
    return {name: q.build for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for EVERY declared operator — as of round 5 the
    registry carries zero rows-only entries (approximate sketches
    emit value+error-band booleans, hash-family ops declare their
    md5 member), so this dict covers queries() completely."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
