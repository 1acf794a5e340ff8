"""Composed codec pipelines ("model families" of the framework).

The reference crate exposes raw kernels and leaves composition to callers
(SURVEY.md §3(d)); this package adds the encoder/decoder drivers a framework
user expects: BitPackedCodec, FFoRCodec, DeltaCodec and auto width/reference
selection, all jit-friendly and shard_map-compatible."""

from .codecs import (
    ALPCodec,
    BitPackedCodec,
    Codec,
    DeltaCodec,
    Encoded,
    FFoRCodec,
    RLECodec,
    ZDeltaCodec,
    auto_costs,
    auto_encode,
    bits_needed,
    get_codec,
)

__all__ = [
    "Codec", "ALPCodec", "BitPackedCodec", "DeltaCodec", "FFoRCodec", "RLECodec",
    "ZDeltaCodec", "Encoded", "auto_costs", "auto_encode", "bits_needed",
    "get_codec",
]
