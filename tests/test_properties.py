"""Property-based algebraic invariants (SURVEY.md §5 item 5,
honoring the reference's intended hypothesis tooling,
/root/reference/.gitignore:50)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

rows = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=100),
        st.sampled_from(["a", "b", "c", None]),
    ),
    min_size=0,
    max_size=30,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data, "x INT, s STRING")


@given(data=rows)
@SLOW
def test_filter_commutes_with_project(spark, data):
    df = _df(spark, data)
    a = df.select("x").filter(F.col("x") > 0)
    b = df.filter(F.col("x") > 0).select("x")
    assert sorted(r.x for r in a.collect()) == sorted(r.x for r in b.collect())


@given(data=rows, data2=rows)
@SLOW
def test_union_counts_add(spark, data, data2):
    a, b = _df(spark, data), _df(spark, data2)
    assert a.unionByName(b).count() == a.count() + b.count()


@given(data=rows)
@SLOW
def test_semi_plus_anti_partition_left(spark, data):
    left = _df(spark, data)
    right = _df(spark, [(i, "z") for i in range(0, 50, 3)])
    semi = left.join(right, "x", "left_semi").count()
    anti = left.join(right, "x", "left_anti").count()
    assert semi + anti == left.count()


@given(data=rows)
@SLOW
def test_dedup_idempotent(spark, data):
    df = _df(spark, data)
    once = df.dropDuplicates(["x"])
    assert once.count() == once.dropDuplicates(["x"]).count()
    assert once.count() == df.select("x").distinct().count()


@given(data=rows)
@SLOW
def test_split_is_partition(spark, data):
    """Quarantine split: valid + invalid == total, no overlap."""
    from configdrivendatapipeline_spark.validation import Rule, run_rules

    df = _df(spark, data)
    res = run_rules(
        df,
        [Rule("pos", "range", {"column": "x", "min": 0}, on_fail="quarantine")],
        split=True,
    )
    assert res.valid.count() + res.invalid.count() == df.count()
    assert res.valid.join(res.invalid, ["x", "s"], "inner").count() >= 0
