from .incremental import (
    incremental_index_ingest,
    streaming_dedup,
    streaming_windowed_counts,
)

__all__ = [
    "incremental_index_ingest",
    "streaming_dedup",
    "streaming_windowed_counts",
]
