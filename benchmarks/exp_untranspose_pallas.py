#!/usr/bin/env python
"""Experiment: Pallas untranspose / original-order decode kernels (VERDICT item 1).

XLA tops out at ~17-22e9 ints/s u32 for EVERY untranspose formulation —
permute chain, static minor gather, grouped transpose, MXU identity matmul,
and even the output-domain repeat/select form (exp_untranspose.py,
exp_untranspose_od.py) — vs ~77e9 copy. The relayout must happen inside a
Pallas kernel where HBM sees a pure stream.

The winning structure (pD/pE): think of original order as the 3D view
(B, nl, T) — out[b, seg, r] — whose HBM image IS the flat (B, 1024) output
(contiguous minor dims), so the out BlockSpec is (tile_b, nl, T) and stores
need NO relayout. The decode becomes:

    out[b, seg, r] = (plane_k[b, lane_of_seg(seg)] >> sh(r)) | stitch
        k = (r*W)//T, sh = (r*W)%T

  * per packed word plane (tb, nl): one SMALL lane permutation
    (lane_of_seg, the perfect-shuffle structure lane = 16*h[seg%g] + seg//g)
    and one lanes->sublanes broadcast — the only relayouts, touching W*nl
    elements per block instead of 1024;
  * per-position shift/select vectors from a lane iota (r = lane index);
  * delta = segmented cumsum along r: log2(T) masked pltpu.roll-adds on the
    minor axis, IN THE ORIGINAL DOMAIN (delta accumulates along r, which is
    contiguous minor here) — no transpose anywhere.

Variants (u32):
  copy  pallas passthrough (kernel-side SoL reference)
  pA    load (tb, 1024) -> seg-form reshape/swapaxes in VMEM -> store
  pB    fused undelta_pack, rows->stack->swapaxes (transpose in VMEM)
  pD    output-domain unpack -> original order (3D, no transpose)
  pE    output-domain fused undelta -> original order (pD + roll-scan)

Usage: python benchmarks/exp_untranspose_pallas.py [--blocks N] [--tile N]
       [--interpret] (correctness-only, CPU)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from fastlanes_tpu.core import layout  # noqa: E402
from fastlanes_tpu.ops import bitpack as ops_bitpack  # noqa: E402
from fastlanes_tpu.ops import _engine as eng  # noqa: E402
from fastlanes_tpu.ref import numpy_ref as ref  # noqa: E402


def seg_of_lane(dtype) -> list:
    t = layout.bit_width(dtype)
    return [layout.transpose_index(layout.index(0, l, dtype)) // t
            for l in range(layout.lanes(dtype))]


def lane_of_seg(dtype) -> list:
    s = seg_of_lane(dtype)
    inv = [0] * len(s)
    for l, sg in enumerate(s):
        inv[sg] = l
    return inv


def _rows_from_flat(x, dtype):
    """(tile_b, 1024) transposed -> dict of T (tile_b, nl) row vecs."""
    nl = layout.lanes(dtype)
    return {r: x[:, layout.row_offset(r):layout.row_offset(r) + nl]
            for r in range(layout.bit_width(dtype))}


def _orig_from_rows_swap(rows, dtype):
    """rows -> (tile_b, 1024) original order via stack + swapaxes + lane
    permutation (all VMEM-resident inside the kernel)."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    los = lane_of_seg(dtype)
    A = jnp.stack([rows[r] for r in range(t)], axis=1)   # (tb, T, nl)
    Y = jnp.swapaxes(A, 1, 2)                            # (tb, nl, T)
    pieces = [Y[:, los[s], :] for s in range(nl)]        # static middle-axis perm
    return jnp.concatenate(pieces, axis=-1)              # (tb, 1024)


def _kernel_pA(dtype):
    def kernel(x_ref, o_ref):
        rows = _rows_from_flat(x_ref[...], dtype)
        o_ref[...] = _orig_from_rows_swap(rows, dtype)
    return kernel


def _kernel_pB(width, dtype):
    def kernel(x_ref, base_ref, o_ref):
        prev = base_ref[...]
        rows = {}
        for row, elem in ops_bitpack.unpack_row_stream(
                x_ref[...], width, dtype):
            prev = elem + prev
            rows[row] = prev
        o_ref[...] = _orig_from_rows_swap(rows, dtype)
    return kernel


def _perm_plane(plane, dtype):
    """(tb, nl) word plane, natural lane order -> seg order:
    planep[:, seg] = plane[:, lane_of_seg(seg)]. Uses the perfect-shuffle
    structure lane_of_seg(seg) = 16*h[seg % g] + seg // g with g = nl/16:
    reshape (tb, g, 16) -> pick h rows -> swap minor axes -> flatten."""
    nl = layout.lanes(dtype)
    g = nl // 16
    if g <= 1:
        return plane  # u64: identity segment order
    los = lane_of_seg(dtype)
    h = [los[m] // 16 for m in range(g)]  # 16*h[m] + 0 = lane_of_seg(m)
    tb = plane.shape[0]
    v = plane.reshape(tb, g, 16)
    v = jnp.concatenate([v[:, hh:hh + 1, :] for hh in h], axis=1)
    return jnp.swapaxes(v, 1, 2).reshape(tb, nl)


def _od_decode_3d(x, width, dtype, tb):
    """Output-domain unpack -> (tb, nl, T) original-order 3D image.
    All per-position vectors built from a lane iota (r = minor index)."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    log2t = t.bit_length() - 1
    r = jax.lax.broadcasted_iota(jnp.uint32, (tb, nl, t), 2)
    bit = r * jnp.uint32(width)
    k_idx = bit >> jnp.uint32(log2t)
    sh = bit & jnp.uint32(t - 1)
    straddle = sh > jnp.uint32(t - width)
    acc = jnp.zeros((tb, nl, t), jnp.uint32)
    reps = []
    for kk in range(width):
        plane = _perm_plane(x[:, kk * nl:(kk + 1) * nl], dtype)
        reps.append(jnp.broadcast_to(plane[:, :, None], (tb, nl, t)))
    for kk in range(width):
        acc = jnp.where(k_idx == jnp.uint32(kk), reps[kk] >> sh, acc)
    for kk in range(1, width):
        m = (k_idx == jnp.uint32(kk - 1)) & straddle
        acc = jnp.where(m, acc | (reps[kk] << (jnp.uint32(t) - sh)), acc)
    if width < t:
        acc = acc & jnp.uint32((1 << width) - 1)
    return acc, r


def _seg_scan_3d(acc, r, t):
    """Inclusive prefix-sum along the minor axis (r) — log2(T) masked
    roll-adds; delta accumulation in the original domain."""
    s = 1
    while s < t:
        rolled = pltpu.roll(acc, s, 2)
        acc = acc + jnp.where(r >= jnp.uint32(s), rolled,
                              jnp.zeros_like(rolled))
        s *= 2
    return acc


def _kernel_pD(width, dtype, tb):
    def kernel(x_ref, o_ref):
        acc, _ = _od_decode_3d(x_ref[...], width, dtype, tb)
        o_ref[...] = acc
    return kernel


def _kernel_pE(width, dtype, tb):
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)

    def kernel(x_ref, base_ref, o_ref):
        acc, r = _od_decode_3d(x_ref[...], width, dtype, tb)
        acc = _seg_scan_3d(acc, r, t)
        basep = _perm_plane(base_ref[...], dtype)
        acc = acc + jnp.broadcast_to(basep[:, :, None], (tb, nl, t))
        o_ref[...] = acc
    return kernel


def _kernel_copy():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] ^ jnp.uint32(1)
    return kernel


# -- run-concat variants (pF/pG): toolchain probe r5 showed Mosaic crashes
# on every lanes->sublanes relayout (stack/swapaxes/minor-index stores/3D
# reshape) but COMPILES broadcast-to-3D, minor-axis pad/slice, and
# single-lane slice+concat permutations. So build the (tb, nl, T) original
# -order image without any transpose: per packed word kk, the output
# positions r with (r*W)//T == kk form a CONTIGUOUS run [r0, r1); slice a
# broadcast of plane kk to the run width, shift by the per-position vector,
# OR the run's straddling last column from plane kk+1, and concatenate the
# runs along the minor axis. O(1) ops per element (vs the O(W) select
# chain of pD/pE). Delta's per-segment prefix sum = log2(T) pad-adds along
# the minor axis (zeros shift in at each segment start by construction).


def _perm_plane_slices(plane, dtype):
    """(tb, nl) natural lane order -> seg order via single-lane static
    slices + concat (the only lane permutation this Mosaic accepts)."""
    los = lane_of_seg(dtype)
    return jnp.concatenate([plane[:, p:p + 1] for p in los], axis=1)


def _runs(width, t):
    """Contiguous output-position runs per packed word: list of
    (kk, r0, r1, straddles) with straddles = last element continues into
    word kk+1."""
    out = []
    for kk in range(width):
        rs = [r for r in range(t) if (r * width) // t == kk]
        r0, r1 = rs[0], rs[-1] + 1
        sh_last = ((r1 - 1) * width) % t
        out.append((kk, r0, r1, sh_last + width > t))
    return out


def _run_concat_3d(x, width, dtype, tb, perm_in_kernel=True):
    """Packed (tb, plen) -> (tb, nl, T) original-order unpacked image,
    run-concat structure (no mask/scan applied)."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    planes = []
    for kk in range(width):
        p = x[:, kk * nl:(kk + 1) * nl]
        planes.append(_perm_plane_slices(p, dtype) if perm_in_kernel else p)
    pieces = []
    for kk, r0, r1, straddles in _runs(width, t):
        rw = r1 - r0
        bc = jnp.broadcast_to(planes[kk][:, :, None], (tb, nl, rw))
        r = jax.lax.broadcasted_iota(jnp.uint32, (tb, nl, rw), 2) + jnp.uint32(r0)
        sh = (r * jnp.uint32(width)) & jnp.uint32(t - 1)
        main = bc >> sh
        if straddles and kk + 1 < width:
            sh_last = ((r1 - 1) * width) % t
            hi = planes[kk + 1][:, :, None] << jnp.uint32(t - sh_last)
            last = main[:, :, rw - 1:rw] | hi
            pieces.append(main[:, :, :rw - 1])
            pieces.append(last)
        else:
            pieces.append(main)
    acc = jnp.concatenate(pieces, axis=2) if len(pieces) > 1 else pieces[0]
    if width < t:
        acc = acc & jnp.uint32((1 << width) - 1)
    return acc


def _seg_scan_pad(acc, t):
    """Inclusive per-segment prefix sum along the minor axis via pad/slice
    shifted adds (zeros enter at each segment's start)."""
    s = 1
    while s < t:
        acc = acc + jnp.pad(acc, ((0, 0), (0, 0), (s, 0)))[:, :, :t]
        s *= 2
    return acc


def _kernel_pF(width, dtype, tb):
    def kernel(x_ref, o_ref):
        o_ref[...] = _run_concat_3d(x_ref[...], width, dtype, tb)
    return kernel


def _kernel_pG(width, dtype, tb, perm_in_kernel=True):
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)

    def kernel(x_ref, base_ref, o_ref):
        acc = _run_concat_3d(x_ref[...], width, dtype, tb,
                             perm_in_kernel=perm_in_kernel)
        acc = _seg_scan_pad(acc, t)
        basep = (_perm_plane_slices(base_ref[...], dtype)
                 if perm_in_kernel else base_ref[...])
        o_ref[...] = acc + basep[:, :, None]
    return kernel


def _call(kernel, n_blocks, tile_b, in_cols, out_shape3, dtype,
          extra_specs=(), interpret=False):
    n_tiles = n_blocks // tile_b
    io_dt = eng.jnp_dtype(dtype)
    if isinstance(out_shape3, tuple):  # 3D (nl, t) out
        out_spec = pl.BlockSpec((tile_b, *out_shape3),
                                lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, *out_shape3), io_dt)
    else:
        out_spec = pl.BlockSpec((tile_b, out_shape3), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, out_shape3), io_dt)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_b, in_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM), *extra_specs],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=131072)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--width", type=int, default=3)
    ap.add_argument("--dtype", default="u32")
    ap.add_argument("--only", default=None)
    ap.add_argument("--interpret", action="store_true",
                    help="correctness only, interpret mode (CPU-safe)")
    args = ap.parse_args()

    dt = args.dtype
    t, nl = layout.bit_width(dt), layout.lanes(dt)
    np_dt = layout.np_dtype(dt)
    w = min(args.width, t)
    n_blocks, K, tile_b = args.blocks, args.k, args.tile
    if args.interpret:
        n_blocks = tile_b * 2
    n_ints = n_blocks * 1024
    rng = np.random.default_rng(0)

    plen = layout.packed_len(dt, w)
    # Oracle-produced bits only for the tile-sized correctness slice; the
    # timing arrays are raw random words (decode cost is data-independent)
    # — preparing oracle data at 131072 blocks costs >10min of host NumPy.
    values = rng.integers(0, 1 << w, (tile_b, 1024), dtype=np.uint64).astype(np_dt)
    transposed = ref.transpose(values, dt)
    base = np.ascontiguousarray(transposed[:, :nl])
    deltas = ref.delta(transposed, base, dt)
    packed_d_np = ref.pack(deltas, w, dt)
    packed_v_np = ref.pack(transposed, w, dt)

    def big(small_np, cols):
        full = rng.integers(0, np.iinfo(np_dt).max, (n_blocks, cols),
                            dtype=np.uint64).astype(np_dt)
        full[:tile_b] = small_np
        return jax.block_until_ready(jnp.asarray(full))

    x = big(transposed, 1024)
    packed_d = big(packed_d_np, plen)
    packed_v = big(packed_v_np, plen)
    base_dev = big(base, nl)

    def build(nb, interp):
        base_spec = pl.BlockSpec((tile_b, nl), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        return [
            ("copy", _call(_kernel_copy(), nb, tile_b, 1024, 1024, dt,
                           interpret=interp), (x,), "ut"),
            ("pA", _call(_kernel_pA(dt), nb, tile_b, 1024, 1024, dt,
                         interpret=interp), (x,), "ut"),
            ("pB", _call(_kernel_pB(w, dt), nb, tile_b, plen, 1024, dt,
                         (base_spec,), interpret=interp),
             (packed_d, base_dev), "ud"),
            ("pD", _call(_kernel_pD(w, dt, tile_b), nb, tile_b, plen,
                         (nl, t), dt, interpret=interp), (packed_v,), "up"),
            ("pE", _call(_kernel_pE(w, dt, tile_b), nb, tile_b, plen,
                         (nl, t), dt, (base_spec,), interpret=interp),
             (packed_d, base_dev), "ud"),
            ("pF", _call(_kernel_pF(w, dt, tile_b), nb, tile_b, plen,
                         (nl, t), dt, interpret=interp), (packed_v,), "up"),
            ("pG", _call(_kernel_pG(w, dt, tile_b), nb, tile_b, plen,
                         (nl, t), dt, (base_spec,), interpret=interp),
             (packed_d, base_dev), "ud"),
        ]

    def filt(cands):
        if args.only:
            keep = set(args.only.split(","))
            cands = [c for c in cands if c[0] in keep]
        return cands

    # correctness first (tile-sized slice, same kernel structure)
    want_ut = ref.untranspose(np.asarray(transposed[:tile_b]), dt)
    want_up = ref.untranspose(ref.unpack(np.asarray(packed_v[:tile_b]), w, dt), dt)
    want_ud = ref.untranspose(ref.undelta_pack(
        np.asarray(packed_d[:tile_b]), base[:tile_b], w, dt), dt)
    wants = {"ut": want_ut, "up": want_up, "ud": want_ud}
    ok = set()
    for name, call, arrs, kind in filt(build(tile_b, args.interpret)):
        small = tuple(a[:tile_b] for a in arrs)
        try:
            got = np.asarray(jax.jit(call)(*small)).reshape(tile_b, 1024)
        except Exception as e:
            print(f"# {name} correctness-run FAILED: {str(e)[:160]}",
                  flush=True)
            continue
        if name == "copy":
            ok.add(name)
            continue
        if np.array_equal(got, wants[kind]):
            print(f"# {name} correct", flush=True)
            ok.add(name)
        else:
            print(f"# {name} WRONG", flush=True)
    if args.interpret:
        return

    def chained(fn, *arrs):
        @jax.jit
        def rep(a0):
            def body(c, _):
                out = fn(jnp.bitwise_xor(a0, c), *arrs[1:])
                out = jax.lax.optimization_barrier(out)
                nc = jnp.where(out.reshape(-1)[0] < np_dt.type(
                    np.iinfo(np_dt).max), 0, 1)
                return nc.astype(a0.dtype), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), a0.dtype), None, length=K)
            return c
        _ = np.asarray(rep(arrs[0]))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = np.asarray(rep(arrs[0]))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / K

    for name, call, arrs, kind in filt(build(n_blocks, False)):
        if name not in ok:
            continue
        try:
            sec = chained(call, *arrs)
            print(f"{dt} {name:6s} tile={tile_b} {n_ints / sec / 1e9:8.1f} e9 ints/s",
                  flush=True)
        except Exception as e:
            print(f"{dt} {name:6s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
