from .columns import (  # noqa: F401
    AUDIO_SCHEMA,
    IMAGE_SCHEMA,
    decode_audio,
    decode_bmp,
    decode_images,
    decode_wav,
    encode_bmp,
    extract_image_features,
    frame_sample_videos,
    resize_images,
)
