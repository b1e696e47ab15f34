"""Structured Streaming: continuous tile-assignment ingest (stream-static
spatial join + checkpointed, lineage-tracked sink) and stateful extensions
(watermarked windowed aggregation, applyInPandasWithState dedup)."""

from geo_epic_spark.streaming.ingest import (  # noqa: F401
    assign_stream,
    read_image_stream,
    start_assignment_sink,
)
from geo_epic_spark.streaming.stateful import (  # noqa: F401
    stateful_dedup_stream,
    windowed_event_counts,
)
