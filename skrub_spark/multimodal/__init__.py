from .columns import (  # noqa: F401
    AUDIO_SCHEMA,
    IMAGE_SCHEMA,
    decode_audio,
    decode_bmp,
    decode_image,
    decode_images,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_audio_features,
    extract_image_features,
    frame_sample_videos,
    resize_images,
)
from .avi import decode_avi_frames, encode_avi  # noqa: F401
from .pdf import build_pdf, extract_pdf_text, pdf_text_stats  # noqa: F401
from .mime import sniff_mime  # noqa: F401
from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401
from .png import decode_png, encode_png  # noqa: F401
