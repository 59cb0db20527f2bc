from warp10_platform_spark.multimodal.media import (  # noqa: F401
    attach_fake_images,
    attach_jpeg_images,
    attach_png_images,
    audio_features,
    decode_gray_raw,
    decode_png,
    encode_png_gray,
    dhash_images,
    frame_sample,
    resize_nearest,
)
