"""Structured Streaming layer (SURVEY.md §2.10).

Batch/stream parity is the design rule: every streaming op is the
same DataFrame expression as its batch twin, run through
``readStream`` + ``Trigger.AvailableNow`` — so the DuckDB oracle for
the batch form also verifies the streaming plan.
"""

from configdrivendatapipeline_spark.streaming.ops import (
    note_stream_source,
    run_available_now,
    stream_events,
)

__all__ = ["stream_events", "run_available_now", "note_stream_source"]
