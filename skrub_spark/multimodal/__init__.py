from .columns import (  # noqa: F401
    IMAGE_SCHEMA,
    decode_images,
    extract_image_features,
    frame_sample_videos,
    resize_images,
)
