from warp10_platform_spark.multimodal.media import (  # noqa: F401
    attach_fake_images,
    audio_features,
    decode_gray_raw,
    dhash_images,
    frame_sample,
    resize_nearest,
)
