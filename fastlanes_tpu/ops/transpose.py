"""jnp Transpose codec (reference src/transpose.rs:11-22, 29-36).

TPU-first design: instead of the reference's fully-unrolled 1024-element
gather, the 04261537 interleave is expressed as reshape + small-axis
permutation + axis transpose, which XLA lowers to vreg shuffles — no gather:

  transpose:    out[(r,g,l)] = in[(l, FL_ORDER[g], r)]   with in as (16,8,8)
  untranspose:  inverse (FL_ORDER is self-inverse)

where out is viewed as (row:8, order:8, lane:16) and in as (lane:16, o:8, row:8).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import layout
from . import _engine as eng

_FL = list(layout.FL_ORDER)


def _transpose_one(arr2d):
    b = arr2d.shape[0]
    x = arr2d.reshape(b, 16, 8, 8)          # (B, lane, order-source, row)
    x = x[:, :, _FL, :]                     # apply FL_ORDER on the middle axis
    x = jnp.transpose(x, (0, 3, 2, 1))      # -> (B, row, order, lane)
    return x.reshape(b, 1024)


def _untranspose_one(arr2d):
    b = arr2d.shape[0]
    x = arr2d.reshape(b, 8, 8, 16)          # (B, row, order, lane)
    x = jnp.transpose(x, (0, 3, 2, 1))      # -> (B, lane, order, row)
    x = x[:, :, _FL, :]                     # FL_ORDER self-inverse
    return x.reshape(b, 1024)


# -- standalone relayout strategies (routing keys transpose_st /
#    untranspose_st). The reshape/permute composite measured 22.8/16.9e9
#    ints/s u32 on v5e against ~102e9 copy SoL (r2); the one static
#    1024-gather is the measured alternative (a full one-hot MXU matmul is
#    flop-bound at ~4096 flops/int — below copy SoL — so the MXU only
#    helps in the segment form raced by benchmarks/exp_untranspose.py).
#    NOTE: the hot paths no longer go through these ops at all — decode
#    fuses the untranspose (ops/orig.py) and encode the transpose
#    (delta_pack_orig); these standalone entries remain parity API (C11).


import functools


def _gather_one(perm):
    idx = jnp.asarray(perm)

    def fn(arr2d):
        return arr2d[:, idx]

    return fn


def _transpose_axes_one(arr2d):
    """The 04261537 interleave as ONE pure axis reversal — no gather, no
    take: with i = a*128 + b*16 + g (a,b<8, g<16), transpose_index maps
    (a, b, g) -> (g, bitrev3(b), a), and FL_ORDER's bit-reversal of the
    middle 3 bits IS the reversal of three split 2-axes. So
    out = in.reshape(16,2,2,2,8) with axes fully reversed."""
    b = arr2d.shape[0]
    x = arr2d.reshape(b, 16, 2, 2, 2, 8)
    return jnp.transpose(x, (0, 5, 4, 3, 2, 1)).reshape(b, 1024)


def _untranspose_axes_one(arr2d):
    b = arr2d.shape[0]
    x = arr2d.reshape(b, 8, 2, 2, 2, 16)
    return jnp.transpose(x, (0, 5, 4, 3, 2, 1)).reshape(b, 1024)


@functools.lru_cache(maxsize=None)
def _mxu2_factors(kind: str, dtype: str):
    """Two-sided MXU factorization: within a block the 04261537 interleave
    is Out = A · Xᵀ · B in the (T, LANES) matrix view — the transposed lane
    l is a CONTIGUOUS original segment, so the 1024-permutation factors
    into a row perm × matrix transpose × column perm. Two (≤64)² one-hot
    matmuls per block ≈ 2·min(T,NL) MACs/element — 16-32x fewer flops than
    the flat 1024-wide one-hot form (which IS flop-bound, exp_untranspose).
    Every output element sums exactly one product, so f32 planes of ≤16
    bits are exact."""
    import numpy as np

    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    seg_of_lane = [layout.transpose_index(layout.index(0, l)) // t
                   for l in range(nl)]
    lane_of_seg = [0] * nl
    for l, s in enumerate(seg_of_lane):
        lane_of_seg[s] = l
    g_of_r = [layout.row_offset(r) // nl for r in range(t)]
    r_of_g = [0] * t
    for r, g in enumerate(g_of_r):
        r_of_g[g] = r
    if kind == "untranspose":
        # Out[s, r] = In[g(r), lane_of_seg(s)]
        A = np.zeros((nl, nl), np.float32)
        A[np.arange(nl), lane_of_seg] = 1.0
        B = np.zeros((t, t), np.float32)
        B[g_of_r, np.arange(t)] = 1.0
    else:
        # Out[g, l] = InO[seg_of_lane(l), r_of_g(g)]
        A = np.zeros((nl, nl), np.float32)
        A[np.arange(nl), seg_of_lane] = 1.0
        B = np.zeros((t, t), np.float32)
        B[r_of_g, np.arange(t)] = 1.0
    return A, B


def _mxu2_fn(kind: str, dtype: str):
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    A_np, B_np = _mxu2_factors(kind, dtype)

    def fn(arr2d):
        jdt = arr2d.dtype
        b = arr2d.shape[0]
        A = jnp.asarray(A_np)
        B = jnp.asarray(B_np)
        elem_bits = arr2d.dtype.itemsize * 8
        planes = 2 if elem_bits > 16 else 1
        out = None
        for i in range(planes):
            if planes == 1:
                p = arr2d
            else:
                p = (arr2d >> jdt.type(i * 16)) & jdt.type(0xFFFF)
            if kind == "untranspose":
                X = p.astype(jnp.float32).reshape(b, t, nl)
                Z = jnp.einsum("gr,bgl->brl", B, X,
                               preferred_element_type=jnp.float32)
                Y = jnp.einsum("sl,brl->bsr", A, Z,
                               preferred_element_type=jnp.float32)
            else:
                X = p.astype(jnp.float32).reshape(b, nl, t)
                Z = jnp.einsum("ls,bsr->blr", A, X,
                               preferred_element_type=jnp.float32)
                Y = jnp.einsum("blr,rg->bgl", Z, B,
                               preferred_element_type=jnp.float32)
            y = Y.astype(jdt).reshape(b, layout.BLOCK)
            out = y if out is None else out | (y << jdt.type(i * 16))
        return out

    return fn


@functools.lru_cache(maxsize=None)
def _st_strategy(op: str) -> str:
    from ..kernels import routing

    strat = routing.best_path(op, "u32", 0)  # dtype-independent permutation
    return (strat if strat in ("permute", "gather", "axes", "mxu")
            else "permute")


@functools.lru_cache(maxsize=None)
def _one_fn(kind: str, strategy: str, dtype: str = "u32"):
    if strategy == "gather":
        return _gather_one(layout.transpose_perm() if kind == "transpose"
                           else layout.untranspose_perm())
    if strategy == "axes":
        return (_transpose_axes_one if kind == "transpose"
                else _untranspose_axes_one)
    if strategy == "mxu":
        return _mxu2_fn(kind, dtype)
    return _transpose_one if kind == "transpose" else _untranspose_one


def _apply(kind, values, dtype, planes=False):
    from .bitpack import _check_planes

    dtype = layout.canon_dtype(dtype)
    _check_planes(planes, dtype)
    fn = _one_fn(kind, _st_strategy(f"{kind}_st"), dtype)
    vec = eng.to_vec(values, dtype)
    vec, had_batch = eng.promote_shape(vec, dtype)
    if eng.is_limb(dtype):
        out = (fn(vec[0]), fn(vec[1]))
    else:
        out = fn(vec)
    out = eng.squeeze_shape(out, had_batch, dtype)
    if planes:
        return out
    return eng.from_vec(out, dtype, like=values)


def transpose(values, dtype, *, planes: bool = False):
    """Transpose::transpose: out[i] = in[transpose_index(i)] (transpose.rs:11-15).
    planes=True (u64 only): (lo, hi) uint32 planes in/out."""
    return _apply("transpose", values, dtype, planes)


def untranspose(values, dtype, *, planes: bool = False):
    """Transpose::untranspose: out[transpose_index(i)] = in[i] (transpose.rs:18-22).
    planes=True (u64 only): (lo, hi) uint32 planes in/out."""
    return _apply("untranspose", values, dtype, planes)
