"""SURVEY.md §2.6 — sorts, limits, set operations.

Determinism: the order-insensitive oracle hash cannot see row order,
so ordered operators (sort_multi, topk_global, limit_n) carry an
explicit rank column / unique-key sort that makes the *selected set*
and the *rank values* order-proof.

Scale notes: `orderBy().limit(k)` compiles to TakeOrderedAndProject
(per-partition top-k + driver merge of k·p rows — no total sort);
global ROW_NUMBER over a total order is declared only over a LIMITed
subset, never a full 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from configdrivendatapipeline_spark.queries import declare, load

_SEC = "2.6"


@declare(
    "sort_multi",
    """
    WITH top AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders
      ORDER BY o_orderpriority ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
      LIMIT 100
    )
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY o_orderpriority ASC NULLS FIRST,
                              o_totalprice DESC, o_orderkey ASC) AS rnk
    FROM top
    """,
    _SEC,
    "Multi-key ORDER BY (asc/desc, nulls-first) verified via an "
    "explicit rank column over the selected top-100.",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    keys = [
        F.col("o_orderpriority").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ]
    top = o.select("o_orderkey", "o_orderpriority", "o_totalprice").orderBy(*keys).limit(100)
    return top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(*keys)).cast("long")
    )


@declare(
    "limit_n",
    "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10",
    _SEC,
    "LIMIT after a total order on a unique key (deterministic).",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderkey").orderBy("o_orderkey").limit(10)


@declare(
    "topk_global",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 5
    """,
    _SEC,
    "Global top-k → TakeOrderedAndProject (no total sort at scale).",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(5)
    )


@declare(
    "set_union_all",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal < 1000
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal < 5000
    """,
    _SEC,
    "Bag union (duplicates preserved): unionByName.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") < 1000).select("c_custkey")
    b = c.filter(F.col("c_acctbal") < 5000).select("c_custkey")
    return a.unionByName(b)


@declare(
    "set_union_distinct",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal < 1000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 5000
    """,
    _SEC,
    "Set union (distinct).",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") < 1000).select("c_custkey")
    b = c.filter(F.col("c_acctbal") < 5000).select("c_custkey")
    return a.unionByName(b).distinct()


@declare(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
    _SEC,
    "Set intersection: customers ordering in both periods.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return early.intersect(late)


@declare(
    "set_intersect_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
    _SEC,
    "Bag intersection (multiplicity = min of the two sides).",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return early.intersectAll(late)


@declare(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    """,
    _SEC,
    "Set difference: customers who never ordered.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
         .select(F.col("o_custkey").alias("c_custkey")))
    return c.exceptAll(o).distinct()


@declare(
    "set_except_all",
    """
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    _SEC,
    "Bag difference (per-row multiplicity subtraction).",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    all_keys = o.select("o_custkey")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_keys.exceptAll(f_keys)


@declare(
    "distinct_rows",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    _SEC,
    "DISTINCT over a projection.",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@declare(
    "sort_local",
    """
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_day
    FROM orders
    """,
    _SEC,
    "Partition-local sort (sortWithinPartitions): orders each "
    "partition by date WITHOUT a global range exchange — the sort "
    "you actually want before a partitioned write (parquet min/max "
    "pruning needs within-file order, not total order). The builder "
    "asserts the plan contains a Sort but NO Exchange; content is "
    "order-insensitively identical to the plain scan, which is what "
    "the oracle checks.",
)
def sort_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    import io as _io
    from contextlib import redirect_stdout

    df = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("order_day"),
        )
        .sortWithinPartitions("order_day")
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    if "Sort" not in plan:
        raise AssertionError(f"expected a local sort in the plan:\n{plan}")
    if "Exchange" in plan:
        raise AssertionError(f"local sort must not exchange:\n{plan}")
    return df
