"""Pallas TPU kernels — the hot compute path. Same signatures as the ops
layer; transparently falls back to XLA ops off-TPU."""

from . import pallas_codecs
from .pallas_codecs import (
    delta_pack,
    warmup,
    for_pack,
    pack,
    undelta_pack,
    unzdelta_pack,
    unfor_pack,
    unpack,
)

__all__ = [
    "pallas_codecs", "pack", "unpack", "undelta_pack", "unzdelta_pack", "delta_pack",
    "for_pack", "unfor_pack", "warmup",
]
