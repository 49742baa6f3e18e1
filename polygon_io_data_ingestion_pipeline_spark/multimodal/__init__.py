from .binaryops import (
    MEDIA_SCHEMA,
    decode_image_features,
    frame_sample_video,
    media_stats,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_image_features",
    "frame_sample_video",
    "media_stats",
    "resize_images",
]
