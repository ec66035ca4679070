from .incremental import (
    incremental_index_ingest,
    stateful_sessionizer,
    stateful_user_counters,
    streaming_dedup,
    streaming_embedding_dedup_ingest,
    streaming_first_per_key,
    streaming_interval_join,
    streaming_lsh_dedup_ingest,
    streaming_windowed_counts,
)

__all__ = [
    "incremental_index_ingest",
    "stateful_sessionizer",
    "stateful_user_counters",
    "streaming_dedup",
    "streaming_embedding_dedup_ingest",
    "streaming_first_per_key",
    "streaming_interval_join",
    "streaming_lsh_dedup_ingest",
    "streaming_windowed_counts",
]
