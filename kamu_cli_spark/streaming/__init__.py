from kamu_cli_spark.streaming.stateful import (
    streaming_topn_to_changelog,
    streaming_upsert_to_changelog,
)
from kamu_cli_spark.streaming.stream import (
    read_dataset_stream,
    session_aggregate,
    stream_ingest,
    streaming_asof_enrich,
    streaming_dedup_exact,
    streaming_interval_join,
    windowed_aggregate,
)

__all__ = [
    "read_dataset_stream",
    "session_aggregate",
    "stream_ingest",
    "streaming_asof_enrich",
    "streaming_dedup_exact",
    "streaming_interval_join",
    "streaming_topn_to_changelog",
    "streaming_upsert_to_changelog",
    "windowed_aggregate",
]
