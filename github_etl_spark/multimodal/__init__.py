"""Multimodal layer: binary media columns + Arrow-batched operators."""

from .media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_stats,
    extract_features,
    repartition_by_payload,
    resize_images,
    sample_frames,
    synthesize_media,
)
