from .binaryops import (
    MEDIA_SCHEMA,
    PRODUCTION_DECODERS,
    decode_audio_features,
    decode_image_features,
    decode_pnm,
    decode_wav,
    encode_pnm,
    frame_sample_video,
    media_stats,
    resize_images,
    resize_pnm,
)

__all__ = [
    "MEDIA_SCHEMA",
    "PRODUCTION_DECODERS",
    "decode_audio_features",
    "decode_image_features",
    "decode_pnm",
    "decode_wav",
    "encode_pnm",
    "frame_sample_video",
    "media_stats",
    "resize_images",
    "resize_pnm",
]
