"""Layout core: FL_ORDER, index maps, inverse tables, dtype registry."""

from . import layout
from .layout import (
    BLOCK,
    DTYPES,
    FL_ORDER,
    bit_width,
    canon_dtype,
    check_width,
    index,
    lanes,
    np_dtype,
    packed_len,
    transpose_index,
)

__all__ = [
    "layout", "BLOCK", "DTYPES", "FL_ORDER", "bit_width", "canon_dtype",
    "check_width", "index", "lanes", "np_dtype", "packed_len", "transpose_index",
]
