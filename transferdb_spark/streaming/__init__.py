"""`all` mode — incremental replication on Structured Streaming (§2.9)."""

from transferdb_spark.streaming.incr import (  # noqa: F401
    apply_cdc_stream,
    hourly_rollup_stream,
    stream_events,
)
