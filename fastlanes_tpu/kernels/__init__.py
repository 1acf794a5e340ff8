"""Pallas TPU kernels — the hot compute path. Same signatures as the ops
layer; transparently falls back to XLA ops off-TPU."""

from . import pallas_codecs
from .pallas_codecs import (
    delta_pack,
    delta_pack_orig,
    warmup,
    for_pack,
    pack,
    pack_map,
    undelta_pack,
    undelta_pack_orig,
    unzdelta_pack,
    unzdelta_pack_orig,
    unfor_pack,
    unpack,
    unpack_orig,
)

__all__ = [
    "pallas_codecs", "pack", "pack_map", "unpack", "undelta_pack", "unzdelta_pack", "delta_pack",
    "for_pack", "unfor_pack", "warmup",
    "unpack_orig", "undelta_pack_orig", "unzdelta_pack_orig", "delta_pack_orig",
]
