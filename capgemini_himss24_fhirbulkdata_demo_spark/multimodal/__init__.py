"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payloads + typed metadata structs, processed with
Arrow-batched ``mapInPandas`` pipelines (decode / feature-extract /
resize / frame-sample). Real decoders (PIL/ffmpeg) are not in this
container, so decoding is gated: the deterministic ``FAKE`` container
format decodes fully, anything else raises NotImplementedError — the
Spark-side schema, partitioning, UDF signatures, and batch shapes are
real and tested.
"""

from .binary import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_images,
    extract_patch_features,
    sample_frames,
    synthesize_media,
)
