"""Original-order (untransposed) decode — the output-domain formulation.

FLT delta/zdelta/rle chunks store TRANSPOSED blocks (transpose.rs:11-15
composed with delta.rs:25-45 in the reference); after decode the consumer
wants original order back (transpose.rs:18-22). Round-2 measurement: a
standalone device untranspose runs at ~17e9 ints/s u32 against a ~102e9
copy speed-of-light and gates every sorted-column file read (VERDICT r2
item 1). Decode-then-permute pays that relayout on the full output.

This module never materializes the transposed image: it decodes each
ORIGINAL-order output position directly from its packed word plane,

    orig[b, seg*T + r] = ((plane_k[b, lane_of_seg(seg)] >> sh) | stitch)
        & mask,   k = (r*W) // T,  sh = (r*W) % T

using only TPU-friendly vocabulary:

  * per-word-plane lane-repeat broadcasts ((B, LANES) -> (B, 1024) with
    each lane repeated T consecutive positions — sublane broadcast),
  * per-position plane selects over a static row mask (jnp.where chains
    with trace-time constants, W+stitch selects total),
  * for delta: a segmented cumsum in the ORIGINAL domain — the prefix sum
    runs along r, which is the contiguous minor position of each T-wide
    output segment, so `jnp.cumsum` on a (B, LANES, T) view does it,
  * one final static lane->segment chunk permutation (concat of T-wide
    column slices — whole-chunk moves applied LAST, where XLA can fuse
    them into the producing selects instead of running a standalone pass).

u64 is not expressible here without limb-carry cumsum; callers compose
the plane decode with untranspose instead (kernels route per measurement).

Reference parity: macros.rs:101-174 (unpack) and delta.rs:48-63
(undelta_pack) composed with transpose.rs:18-22; the output-domain rewrite
is TPU-first structure with no reference counterpart.
"""

from __future__ import annotations

import functools

import numpy as np

from ..core import layout
from . import _engine as eng


@functools.lru_cache(maxsize=None)
def _lane_of_seg(dtype) -> tuple:
    """Inverse of seg_of_lane: which transposed lane feeds original-order
    segment `seg` (orig[seg*T + r] = transposed[index(r, lane_of_seg[seg])];
    derived from transpose.rs:29-36 via layout.transpose_index)."""
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    seg_of_lane = np.array(
        [layout.transpose_index(layout.index(0, lane, dtype)) // t
         for lane in range(nl)], np.int64)
    inv = np.empty_like(seg_of_lane)
    inv[seg_of_lane] = np.arange(nl, dtype=np.int64)
    return tuple(int(x) for x in inv)


def _repeat_lanes(plane, t):
    """(B, LANES) -> (B, LANES*T): each lane value repeated T consecutive
    positions (natural lane-major layout: out[b, l*T + r] = plane[b, l])."""
    import jax.numpy as jnp

    b, nl = plane.shape
    return jnp.broadcast_to(plane[:, :, None], (b, nl, t)).reshape(b, nl * t)


def _natural_unpack(vec, width, dtype):
    """(B, 1024*W/T) packed -> (B, 1024) natural lane-major order:
    out[b, l*T + r] = value(row r, lane l). Plane selects only."""
    import jax.numpy as jnp

    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    jdt = jnp.dtype(layout.np_dtype(dtype).name)
    b = vec.shape[0]
    if width == 0:
        return jnp.zeros((b, layout.BLOCK), jdt)
    r = np.tile(np.arange(t, dtype=np.int64), nl)      # row of position j
    k = (r * width) // t                               # word plane of j
    sh = (r * width) % t                               # shift within word
    straddle = (sh + width > t) & (k + 1 < width)
    np_dt = layout.np_dtype(dtype)
    SH = jnp.asarray(sh.astype(np_dt))
    SL = jnp.asarray(((t - sh) % t).astype(np_dt))
    reps = [_repeat_lanes(vec[:, kk * nl:(kk + 1) * nl], t)
            for kk in range(width)]
    acc = jnp.zeros((b, layout.BLOCK), jdt)
    for kk in range(width):
        acc = jnp.where(jnp.asarray(k == kk), reps[kk] >> SH, acc)
    for kk in range(1, width):
        m = (k == kk - 1) & straddle
        if m.any():
            acc = jnp.where(jnp.asarray(m), acc | (reps[kk] << SL), acc)
    if width < t:
        acc = acc & jdt.type((1 << width) - 1)
    return acc


def _chunk_perm(nat, dtype):
    """Natural lane-major (B, 1024) -> original order: output segment `seg`
    is the T-wide chunk of lane lane_of_seg[seg] — a static concat of
    T-wide column slices."""
    import jax.numpy as jnp

    t = layout.bit_width(dtype)
    return jnp.concatenate(
        [nat[:, l * t:(l + 1) * t] for l in _lane_of_seg(dtype)], axis=1)


def _seg_cumsum(nat, dtype):
    """Wrapping cumulative sum along r within each T-wide chunk of the
    natural lane-major image — the original-domain form of the per-lane
    delta accumulation (delta.rs:36-45: row order IS position order within
    each output segment)."""
    import jax.numpy as jnp

    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    b = nat.shape[0]
    return jnp.cumsum(nat.reshape(b, nl, t), axis=-1,
                      dtype=nat.dtype).reshape(b, layout.BLOCK)


def _check_dtype(dtype) -> str:
    dtype = layout.canon_dtype(dtype)
    if eng.is_limb(dtype):
        raise ValueError(
            "output-domain decode has no u64 limb form (carry-aware "
            "segmented cumsum); compose unpack(planes=True) with "
            "untranspose instead")
    return dtype


def unpack_orig(packed, width, dtype):
    """unpack + untranspose in one pass: packed transposed-domain blocks ->
    ORIGINAL-order (B, 1024) values, no transposed image materialized."""
    dtype = _check_dtype(dtype)
    layout.check_width(dtype, width)
    vec = eng.to_vec(packed, dtype)
    vec, had_batch = eng.promote_shape(vec, dtype)
    out = _chunk_perm(_natural_unpack(vec, width, dtype), dtype)
    return eng.squeeze_shape(out, had_batch, dtype)


def undelta_pack_orig(packed, base, width, dtype):
    """undelta_pack + untranspose in one pass (delta.rs:48-63 composed with
    transpose.rs:18-22): per-segment cumsum in the original domain."""
    dtype = _check_dtype(dtype)
    layout.check_width(dtype, width)
    t = layout.bit_width(dtype)
    vec = eng.to_vec(packed, dtype)
    vec, had_batch = eng.promote_shape(vec, dtype)
    base_vec = _base_2d(base, dtype, vec)
    nat = _seg_cumsum(_natural_unpack(vec, width, dtype), dtype)
    nat = nat + _repeat_lanes(base_vec, t)
    out = _chunk_perm(nat, dtype)
    return eng.squeeze_shape(out, had_batch, dtype)


def unzdelta_pack_orig(packed, base, width, dtype):
    """Fused zdelta decode to original order: unpack -> unzigzag ->
    per-segment cumsum -> chunk permutation, one traced pass."""
    import jax.numpy as jnp

    dtype = _check_dtype(dtype)
    layout.check_width(dtype, width)
    t = layout.bit_width(dtype)
    vec = eng.to_vec(packed, dtype)
    vec, had_batch = eng.promote_shape(vec, dtype)
    base_vec = _base_2d(base, dtype, vec)
    nat = _natural_unpack(vec, width, dtype)
    one = nat.dtype.type(1)
    nat = (nat >> one) ^ (jnp.zeros_like(nat) - (nat & one))  # unzigzag bits
    nat = _seg_cumsum(nat, dtype)
    nat = nat + _repeat_lanes(base_vec, t)
    out = _chunk_perm(nat, dtype)
    return eng.squeeze_shape(out, had_batch, dtype)


def _base_2d(base, dtype, vec):
    """Base operand -> (B, LANES) in the packed batch: scalar, (LANES,)
    shared, or (B, LANES) per-block (the ops/delta._base_vec conventions)."""
    import jax.numpy as jnp

    nl = layout.lanes(dtype)
    jdt = jnp.dtype(layout.np_dtype(dtype).name)
    b = vec.shape[0]
    arr = jnp.asarray(base)
    if arr.dtype != jdt:
        if arr.ndim == 0 or jnp.issubdtype(arr.dtype, jnp.integer):
            arr = arr.astype(jdt)
        else:
            raise ValueError(f"base dtype {arr.dtype} incompatible with {dtype}")
    if arr.ndim == 0:
        return jnp.broadcast_to(arr, (b, nl))
    if arr.ndim == 1:
        if arr.shape[0] != nl:
            raise ValueError(f"shared base must be ({nl},), got {arr.shape}")
        return jnp.broadcast_to(arr[None, :], (b, nl))
    if arr.ndim == 2:
        if arr.shape != (b, nl):
            raise ValueError(f"per-block base must be ({b}, {nl}), got {arr.shape}")
        return arr
    raise ValueError(f"base rank {arr.ndim} not supported")
