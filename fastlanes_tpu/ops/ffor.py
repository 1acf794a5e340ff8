"""jnp FFoR codec: fused frame-of-reference + bit-pack
(reference src/ffor.rs:24-50). Scalar reference per block (or per batch),
unlike Delta's per-lane base."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import layout
from . import _engine as eng
from .bitpack import assemble_blocks, pack_words, unpack_row_stream, _row_fn_of


def _ref_vec(reference, dtype):
    """reference: python int, scalar array, or (B, 1) / (B,) per-block array."""
    if isinstance(reference, int):
        if eng.is_limb(dtype):
            return (jnp.uint32(reference & 0xFFFFFFFF),
                    jnp.uint32((reference >> 32) & 0xFFFFFFFF))
        return jnp.asarray(reference, eng.jnp_dtype(dtype))
    vec = eng.to_vec(reference, dtype)
    # allow (B,) per-block references: broadcast over the lane axis
    if eng.is_limb(dtype):
        lo, hi = vec
        if lo.ndim == 1 and lo.shape[0] != 1:
            return lo[:, None], hi[:, None]
        return vec
    if vec.ndim == 1 and vec.shape[0] != 1:
        return vec[:, None]
    return vec


def for_pack(values, reference, width: int, dtype):
    """FoR::for_pack (ffor.rs:24-36): pack(v.wrapping_sub(reference))."""
    dtype = layout.canon_dtype(dtype)
    vec = eng.to_vec(values, dtype)
    vec, had_batch = eng.promote_shape(vec, dtype)
    ref = _ref_vec(reference, dtype)
    row_src = _row_fn_of(vec, dtype)
    words = pack_words(lambda row: eng.sub(row_src(row), ref, dtype), width, dtype, None)
    if not words:
        b = (vec[0] if eng.is_limb(dtype) else vec).shape[0]
        out = eng.zeros((b, 0), dtype)
    else:
        out = eng.concat_cols(words, dtype)
    out = eng.squeeze_shape(out, had_batch, dtype)
    return eng.from_vec(out, dtype, like=values)


def unfor_pack(packed, reference, width: int, dtype, *, planes: bool = False):
    """FoR::unfor_pack (ffor.rs:38-50): unpack + wrapping_add(reference), fused.
    planes=True (u64 only): separate (lo, hi) uint32 planes out."""
    from .bitpack import _check_planes

    dtype = layout.canon_dtype(dtype)
    _check_planes(planes, dtype)
    vec = eng.to_vec(packed, dtype)
    vec, had_batch = eng.promote_shape(vec, dtype)
    ref = _ref_vec(reference, dtype)
    rows = {row: eng.add(elem, ref, dtype)
            for row, elem in unpack_row_stream(vec, width, dtype)}
    out = eng.squeeze_shape(assemble_blocks(rows, dtype), had_batch, dtype)
    if planes:
        return out
    return eng.from_vec(out, dtype, like=packed)
