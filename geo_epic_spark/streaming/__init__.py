"""Structured Streaming ingest: continuous tile-assignment over an append-only
image table (stream-static spatial join + checkpointed, lineage-tracked sink)."""
