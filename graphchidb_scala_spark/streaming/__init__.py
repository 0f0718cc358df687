"""Streaming/online layer: micro-batch edge ingest + compaction."""

from graphchidb_scala_spark.streaming.ingest import EdgeStore, stream_edges_from_events

__all__ = ["EdgeStore", "stream_edges_from_events"]
