from .binaryops import (
    MEDIA_SCHEMA,
    PRODUCTION_DECODERS,
    decode_audio_features,
    decode_image_features,
    decode_wav,
    frame_sample_video,
    media_stats,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "PRODUCTION_DECODERS",
    "decode_audio_features",
    "decode_image_features",
    "decode_wav",
    "frame_sample_video",
    "media_stats",
    "resize_images",
]
