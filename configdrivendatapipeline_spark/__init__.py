"""ConfigDrivenDataPipeline-Spark — a PySpark-native, YAML-configured
data ingestion / validation / enrichment engine.

Built from scratch against the declared capability surface of
``prajayrajsinghrathore/ConfigDrivenDataPipeline`` (reference is
intent-only: /root/reference/README.md:2 declares a config-driven,
ADF-replacing ingestion platform with customisable validation and
enrichment; it ships no code). The full operator contract is
SURVEY.md §2; every operator here is expressed Spark-first
(DataFrame / Spark SQL / Structured Streaming) so Catalyst + AQE
own the physical plan.

Public surface:

- :func:`get_spark` — tuned local/cluster SparkSession factory.
- :mod:`~configdrivendatapipeline_spark.config` — YAML pipeline
  config model + loader + DAG validation.
- :mod:`~configdrivendatapipeline_spark.compiler` — compiles a
  validated config into lazy DataFrame plans and runs sinks.
- :mod:`~configdrivendatapipeline_spark.queries` — the declared
  query inventory (one entry per SURVEY.md §2 operator) consumed by
  ``__spark_entry__.py``.
"""

from configdrivendatapipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
