"""Source / sink layer: parameterized readers and writers.

This is the "dynamic source handling" pillar of the reference intent
(/root/reference/README.md:2): one parameterized code path per
format, driven entirely by config dicts, with schema-drift handling
in the engine rather than per-pipeline code.
"""

from configdrivendatapipeline_spark.io.sources import read_source
from configdrivendatapipeline_spark.io.sinks import write_sink

__all__ = ["read_source", "write_sink"]
