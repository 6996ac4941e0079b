"""SURVEY.md §2.12 — UDF surface.

UDFs are the documented slow path (SURVEY.md §4: they break
whole-stage codegen and cross the Python boundary) — declared here to
prove the capability, with Arrow-batched variants preferred and every
kernel deterministic so the SQL oracle can re-express it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from configdrivendatapipeline_spark.queries import declare, load

_SEC = "2.12"


@declare(
    "udf_python",
    """
    SELECT o_orderkey,
           6 - CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS priority_weight
    FROM orders
    """,
    _SEC,
    "Row-scalar Python UDF (registered for SQL use too) — the "
    "flexibility escape hatch, ~10-100× slower than built-ins.",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("int")
    def priority_weight(p: str) -> int:
        return 6 - int(p[0])

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", priority_weight(F.col("o_orderpriority")).alias("priority_weight")
    )


@declare(
    "udf_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
    _SEC,
    "Vectorized Arrow pandas_udf: same IEEE math as the JVM "
    "expression, executed on Arrow batches (the fast Python path).",
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@declare(
    "udaf_pandas",
    """
    SELECT l_returnflag,
           ROUND(median(l_quantity), 2) AS med_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    _SEC,
    "Custom grouped aggregate via applyInPandas (Arrow batches per "
    "group) — for aggregates Spark SQL can't express.",
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def group_median(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "med_qty": [round(float(pdf["l_quantity"].median()), 2)],
                "n": [len(pdf)],
            }
        )

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return li.groupBy("l_returnflag").applyInPandas(
        group_median, "l_returnflag STRING, med_qty DOUBLE, n BIGINT"
    )


@declare(
    "udtf_python",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE doc_id < 50)
    SELECT doc_id,
           unnest(toks) AS token,
           CAST(unnest(range(len(toks))) AS INT) AS pos
    FROM d
    """,
    _SEC,
    "Python UDTF (Spark 4): one row in, many rows out, used via "
    "LATERAL join in SQL.",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield t, i

    import uuid

    spark.udtf.register("cddp_tokenize", Tokenize)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    view = f"_udtf_docs_{uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.token, t.pos
        FROM {view} d, LATERAL cddp_tokenize(d.text) t
        """
    )


@declare(
    "sql_step",
    """
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           CAST(FLOOR((CAST(FLOOR(SUM(CAST(c_acctbal AS DECIMAL(18,6))) * 1000000)
                AS BIGINT) + 5000) / 10000) AS DOUBLE) / 100 AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    _SEC,
    "Raw-SQL step THROUGH the YAML config engine: the pipeline is a "
    "config document whose sql op runs over registered temp views.",
)
def sql_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from configdrivendatapipeline_spark.compiler import compile_pipeline
    from configdrivendatapipeline_spark.config import load_pipeline_str

    cfg = load_pipeline_str(
        f"""
pipeline: {{name: sql_step_demo}}
sources:
  customer: {{format: parquet, path: "{sf_dir}/customer.parquet"}}
steps:
  - id: seg_summary
    input: customer
    op: sql
    params:
      views: [customer]
      query: |
        SELECT c_mktsegment, COUNT(*) AS n_cust,
               CAST(FLOOR((CAST(FLOOR(SUM(CAST(c_acctbal AS DECIMAL(18,6))) * 1000000)
                    AS BIGINT) + 5000) / 10000) AS DOUBLE) / 100 AS total_bal
        FROM customer
        GROUP BY c_mktsegment
"""
    )
    return compile_pipeline(spark, cfg)["seg_summary"]


@declare(
    "sql_recursive",
    """
    WITH RECURSIVE months(m) AS (
      SELECT DATE_TRUNC('month', MIN(o_orderdate)) FROM orders
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < (SELECT DATE_TRUNC('month', MAX(o_orderdate)) FROM orders))
    SELECT CAST(m AS DATE) AS month, COUNT(o.o_orderkey) AS n_orders
    FROM months LEFT JOIN orders o ON DATE_TRUNC('month', o.o_orderdate) = months.m
    GROUP BY m
    """,
    _SEC,
    "Recursive CTE (Spark 4 WITH RECURSIVE): calendar densification — "
    "generate every month between the first and last order and count "
    "orders per month INCLUDING empty ones, the gap-aware series a "
    "plain GROUP BY cannot produce. The recursion is O(months) rows "
    "on the driver-side plan, never data-sized; the join back to the "
    "fact is one broadcastable month dimension.",
)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("cddp_orders_rec")
    # Two cost levers on the ~80-level recursion, both with identical
    # results (same month set, same hashsum):
    # 1. Materialize the 1-row bounds once (eager CACHE TABLE) so the
    #    anchor is a cache hit, not an orders scan.
    # 2. Carry `hi` through the recursion as a COLUMN instead of a
    #    scalar subquery in the stop condition: the subquery form
    #    re-planned and re-ran a probe job at EVERY level (~0.2 s of
    #    driver-paced latency per month), which was the entire cost —
    #    measured 18.1 s → 1.4 s at sf0.1. Each level is now a pure
    #    1-row projection+filter over the previous level; recursion
    #    depth (not per-level data) remains the scaling term, which
    #    is how a production calendar densification should behave.
    spark.sql("DROP TABLE IF EXISTS cddp_rec_bounds")
    spark.sql(
        """
        CACHE TABLE cddp_rec_bounds AS
        SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,
               DATE_TRUNC('month', MAX(o_orderdate)) AS hi
        FROM cddp_orders_rec
        """
    )
    return spark.sql(
        """
        WITH RECURSIVE mrec(m, hi) AS (
          SELECT lo, hi FROM cddp_rec_bounds
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, hi FROM mrec WHERE m < hi),
        months(m) AS (SELECT m FROM mrec)
        SELECT CAST(m AS DATE) AS month, COUNT(o.o_orderkey) AS n_orders
        FROM months LEFT JOIN cddp_orders_rec o
          ON DATE_TRUNC('month', o.o_orderdate) = months.m
        GROUP BY m
        """
    )


@declare(
    "src_python_datasource",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 199)) AS doc_id)
    SELECT doc_id,
           CAST(doc_id // 50 AS INT) AS shard,
           array_to_string(list_transform(range(0, 5 + doc_id % 10),
             k -> (['alpha','beta','gamma','delta','epsilon','zeta','eta',
                    'theta','iota','kappa','lambda','mu','nu','xi',
                    'omicron','pi'])[(doc_id * 31 + k) % 16 + 1]), ' ')
             AS text
    FROM ids
    """,
    "2.1",
    "Custom PYTHON data source (Spark 4 pyspark.sql.datasource API) "
    "— the modern extension point for sources Spark can't read "
    "natively (REST APIs, proprietary formats): the reader declares "
    "its own partitions so Spark schedules one task per shard and "
    "rows stream from executor-side Python iterators, never the "
    "driver. The shipped source generates documents as a pure "
    "function of doc_id, so the ENTIRE source output is replayed "
    "bit-for-bit by the SQL oracle — the source, not just a query "
    "over it, is hash-verified.",
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from configdrivendatapipeline_spark.io import pydatasource

    pydatasource.register(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("shards", 4)
        .option("rows_per_shard", 50)
        .load()
    )


@declare(
    "udf_arrow",
    """
    SELECT o_orderkey,
           CAST(LENGTH(o_orderpriority) * 10
                + CAST(SUBSTR(o_orderpriority, 1, 1) AS INT)
             AS INTEGER) AS prio_code
    FROM orders
    """,
    _SEC,
    "Arrow-optimized scalar Python UDF (useArrow=True — Spark 4's "
    "middle path between row-pickled UDFs and pandas UDFs): same "
    "per-row Python semantics, but batches cross the JVM boundary "
    "as Arrow columns, cutting serialization ~5-10x. The demo "
    "computes a priority code any engine can replay.",
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("int", useArrow=True)
    def prio_code(p: str) -> int:
        return len(p) * 10 + int(p[0])

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", prio_code(F.col("o_orderpriority")).alias("prio_code")
    )


@declare(
    "udtf_analyze",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE doc_id < 50)
    SELECT doc_id, toks[1] AS tok0, toks[2] AS tok1, toks[3] AS tok2
    FROM d
    """,
    _SEC,
    "POLYMORPHIC Python UDTF (Spark 4 analyze API): the output "
    "schema — here tok0..tok{n-1} for a constant n — is computed at "
    "PLAN time from the call's literal arguments by a static "
    "analyze() method, the mechanism behind schema-inferring table "
    "functions (CSV head columns, pivoting UDTFs). n=3 leading "
    "tokens per doc; short docs null-pad, which the oracle's "
    "out-of-range list indexing reproduces exactly.",
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstN:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value <= 0:
                raise ValueError("n must be a positive integer literal")
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"tok{i}", StringType())
                        for i in range(n.value)
                    ]
                )
            )

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("cddp_first_n", FirstN)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    view = f"_udtfa_docs_{uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.tok0, t.tok1, t.tok2
        FROM {view} d, LATERAL cddp_first_n(d.text, 3) t
        """
    )


@declare(
    "fn_variant",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           CAST(NULL AS BIGINT) AS missing_x,
           (props->>'$.k') IS NOT NULL AS has_k
    FROM events
    """,
    "2.7",
    "VARIANT semi-structured type (Spark 4): parse_json lifts the "
    "raw props JSON into the binary VARIANT encoding once, then "
    "variant_get extracts typed paths without re-parsing — the "
    "open-schema path for telemetry/props columns where from_json's "
    "fixed schema fights evolution (shredding at the parquet layer "
    "makes the paths columnar at rest). Extracted values are plain "
    "typed columns, so the oracle replays them with JSON path "
    "extraction; a missing path is NULL, not an error.",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.x', 'bigint')").alias("missing_x"),
        F.expr("variant_get(v, '$.k', 'bigint') IS NOT NULL").alias("has_k"),
    )


@declare(
    "sql_pipe",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 100)
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY o_orderstatus
    """,
    _SEC,
    "SQL pipe syntax (Spark 4 `|>` operators): the linear "
    "FROM-first query style — FROM ... |> WHERE ... |> AGGREGATE "
    "... GROUP BY ... — that reads in execution order like a "
    "DataFrame chain; it parses to the IDENTICAL Catalyst plan as "
    "the nested SELECT the oracle uses, which the hash match "
    "proves. Sums are decimal-exact cents.",
)
def sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    o = load(spark, sf_dir, "orders")
    view = f"_pipe_orders_{uuid.uuid4().hex[:8]}"
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        FROM {view}
        |> WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 100)
                          AS BIGINT) AS total_cents
           GROUP BY o_orderstatus
        |> SELECT o_orderstatus, n_orders, total_cents
        """
    )


@declare(
    "sql_params",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    WHERE c_acctbal >= 1000.0 AND c_nationkey < 10
    GROUP BY c_mktsegment
    """,
    _SEC,
    "Parameterized SQL (named :param markers bound via "
    "spark.sql(args=...)): values bind SERVER-SIDE after parsing, so "
    "a user- or config-supplied value can never change query "
    "structure — the injection-safe channel the YAML sql step's "
    "args param rides on (${param} text substitution remains the "
    "structure-changing channel by design).",
)
def sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    c = load(spark, sf_dir, "customer")
    view = f"_param_cust_{uuid.uuid4().hex[:8]}"
    c.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM {view}
        WHERE c_acctbal >= :min_bal AND c_nationkey < :max_nation
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 1000.0, "max_nation": 10},
    )
