from warp10_platform_spark.streaming.ingest import (  # noqa: F401
    read_gts_text_stream,
    streaming_bucketize,
    streaming_last,
)
