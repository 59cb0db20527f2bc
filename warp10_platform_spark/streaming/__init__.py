from warp10_platform_spark.streaming.ingest import (  # noqa: F401
    read_gts_text_stream,
    read_points_stream,
    streaming_bucketize,
    streaming_counter_delta,
    streaming_exact_dedup,
    streaming_minhash_dedup,
    streaming_last,
    streaming_semantic_dedup,
    streaming_sessionize,
)
