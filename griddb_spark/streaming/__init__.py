"""Structured Streaming face of the engine.

GridDB's continuous-ingest pattern (clients ``append`` to a TimeSeries,
periodic aggregations read it back — reference `TimeSeries.java:136-617`,
automatic periodic aggregation `docs/GridDB-5.6-CE-RELEASE_NOTES.md:17`;
server-side triggers were removed in v5, `docs/GridDB-5.0-CE-RELEASE_NOTES.md`)
maps onto Structured Streaming:

- ``read_container_stream`` — a container directory as a file-source stream
  (the ingest side of ``TimeSeries.append``).
- ``group_by_range_stream`` — event-time windowed aggregation with
  watermarks: the streaming twin of ``operators.group_by_range`` /
  TQL ``TIME_WINDOW_AGG``.
- ``upsert_by_key`` — ``foreachBatch`` last-write-wins upsert, the
  streaming face of NoSQL ``put`` (insert-or-update by row key).
"""

from griddb_spark.streaming.stream_ops import (  # noqa: F401
    dedup_stream,
    embed_dedup_stream,
    distinct_sketch_stream,
    hll_sketch_stream,
    freq_sketch_stream,
    quantile_sketch_stream,
    group_by_range_stream,
    interval_join_stream,
    read_container_stream,
    run_to_memory,
    upsert_by_key,
)
