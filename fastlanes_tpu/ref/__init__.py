"""NumPy oracle (exact reference model) for conformance testing."""

from . import numpy_ref
from .numpy_ref import (
    delta,
    delta_pack,
    for_pack,
    pack,
    transpose,
    undelta,
    undelta_pack,
    unfor_pack,
    unpack,
    unpack_single,
    untranspose,
)

__all__ = [
    "numpy_ref", "pack", "unpack", "unpack_single", "delta", "undelta",
    "undelta_pack", "delta_pack", "for_pack", "unfor_pack", "transpose",
    "untranspose",
]
