from warp10_platform_spark.functions.custom import (  # noqa: F401
    Frame,
    macro_bucketizer,
    macro_mapper,
    macro_reducer,
)
