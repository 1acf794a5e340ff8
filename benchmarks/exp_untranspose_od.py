#!/usr/bin/env python
"""Experiment: OUTPUT-DOMAIN decode (round-3 VERDICT item 1, formulation 3).

exp_untranspose.py showed every XLA untranspose-as-relayout formulation
tops out at ~20e9 ints/s u32 (copy 77e9). This script races a different
structure: decode each ORIGINAL-order output position directly from its
packed word plane, so no transpose relayout ever exists:

    orig[b, seg*T + r] = (plane_{k}[b, lane_of_seg(seg)] >> sh) | stitch
        k = (r*W)//T, sh = (r*W)%T

built as: per-plane lane-repeat (B, nl) -> (B, 1024), per-position vector
shifts (constants), plane selects, and for delta a SEGMENTED CUMSUM in the
original domain (delta accumulates along r, which is the contiguous minor
position of each segment) plus a repeated base add. The lane->segment
permutation moves whole T-wide chunks, i.e. a static concat of 32-wide
slices (the cheap class), done LAST.

Variants:
  od_unpack   output-domain bitpack decode -> original order
  od_ud       output-domain fused undelta (cumsum in orig domain) -> orig
  od_zd       zdelta: cumsum of unzigzagged deltas (adds 3 vector ops)
  copy        x ^ 1 (SoL reference)
  ud+gather   best round-2 formulation (undelta then static 1024-gather)

Usage: python benchmarks/exp_untranspose_od.py [--blocks N] [--widths 3,8]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# FASTLANES_TPU_PLATFORM=cpu forces the jax platform BEFORE backend init
# (a site-installed accelerator plugin beats the JAX_PLATFORMS env var,
# and a dead remote-TPU tunnel hangs backend setup).
import os as _os

if _os.environ.get("FASTLANES_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FASTLANES_TPU_PLATFORM"])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastlanes_tpu.core import layout  # noqa: E402
from fastlanes_tpu.ops import delta as ops_delta  # noqa: E402
from fastlanes_tpu.ref import numpy_ref as ref  # noqa: E402


def lane_of_seg(dtype) -> np.ndarray:
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    seg_of_lane = np.array(
        [layout.transpose_index(layout.index(0, l, dtype)) // t
         for l in range(nl)], np.int32)
    inv = np.empty_like(seg_of_lane)
    inv[seg_of_lane] = np.arange(nl, dtype=np.int32)
    return inv


def _repeat(plane, t):
    """(B, nl) -> (B, nl*t), each column repeated t consecutive times."""
    b, nl = plane.shape
    return jnp.broadcast_to(plane[:, :, None], (b, nl, t)).reshape(b, nl * t)


def od_unpack_natural(packed, width, dtype):
    """Output-domain unpack -> NATURAL lane-major order (B, 1024):
    out[b, l*T + r] = v[r, l]. The final chunk permutation to original
    order is applied separately (chunk_perm)."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    jdt = jnp.dtype(layout.np_dtype(dtype).name)
    b = packed.shape[0]
    r = np.tile(np.arange(t, dtype=np.int64), nl)          # r of position j
    k = (r * width) // t
    sh = ((r * width) % t).astype(np.uint32)
    straddle = (sh + width > t) & (k + 1 < width)
    SH = jnp.asarray(sh.astype(layout.np_dtype(dtype)))
    SL = jnp.asarray(((t - sh) % t).astype(layout.np_dtype(dtype)))
    acc = jnp.zeros((b, 1024), jdt)
    reps = [_repeat(packed[:, kk * nl:(kk + 1) * nl], t)
            for kk in range(width)]
    for kk in range(width):
        acc = jnp.where(jnp.asarray(k == kk), reps[kk] >> SH, acc)
    for kk in range(1, width):
        m = jnp.asarray((k == kk - 1) & straddle)
        acc = jnp.where(m, acc | (reps[kk] << SL), acc)
    if width < t:
        acc = acc & jdt.type((1 << width) - 1)
    return acc


def chunk_perm(nat, dtype):
    """natural lane-major (B, 1024) -> original order: chunk seg comes from
    lane lane_of_seg(seg); static concat of T-wide column slices."""
    t = layout.bit_width(dtype)
    los = lane_of_seg(dtype)
    return jnp.concatenate(
        [nat[:, int(l) * t:(int(l) + 1) * t] for l in los], axis=1)


def seg_cumsum(nat, dtype):
    """Cumulative sum along r within each T-wide chunk of the natural
    lane-major image: (B, nl, T) view, cumsum on the minor axis."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    b = nat.shape[0]
    return jnp.cumsum(nat.reshape(b, nl, t), axis=-1,
                      dtype=nat.dtype).reshape(b, 1024)


def od_undelta(packed, base, width, dtype, zig=False):
    nat = od_unpack_natural(packed, width, dtype)
    if zig:
        one = nat.dtype.type(1)
        nat = (nat >> one) ^ jnp.zeros_like(nat) - (nat & one)
    t = layout.bit_width(dtype)
    nat = seg_cumsum(nat, dtype)
    nat = nat + _repeat(base, t)
    return chunk_perm(nat, dtype)


def od_unpack(packed, width, dtype):
    return chunk_perm(od_unpack_natural(packed, width, dtype), dtype)


def untranspose_gather(x2d):
    perm = jnp.asarray(layout.untranspose_perm())
    return x2d[:, perm]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="u32")
    ap.add_argument("--blocks", type=int, default=131072)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--widths", default="3")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    n_blocks, K = args.blocks, args.k
    rng = np.random.default_rng(0)

    def chained(fn, main_arr, *rest):
        @jax.jit
        def rep(x):
            def body(c, _):
                out = fn(jnp.bitwise_xor(x, c), *rest)
                out = jax.lax.optimization_barrier(out)
                flat = out.reshape(-1)
                np_dt = np.dtype(str(flat.dtype))
                top = np_dt.type(np.iinfo(np_dt).max)
                nc = jnp.where(flat[0] < top, 0, 1)
                return nc.astype(x.dtype), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=K)
            return c
        _ = np.asarray(rep(main_arr))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = np.asarray(rep(main_arr))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / K

    for dt in args.dtypes.split(","):
        t = layout.bit_width(dt)
        nl = layout.lanes(dt)
        np_dt = layout.np_dtype(dt)
        n_ints = n_blocks * 1024
        for w in map(int, args.widths.split(",")):
            w = min(w, t)
            values = rng.integers(0, 1 << w, (n_blocks, 1024),
                                  dtype=np.uint64).astype(np_dt)
            transposed = ref.transpose(values, dt)
            x = jax.block_until_ready(jnp.asarray(transposed))
            base = jax.block_until_ready(jnp.asarray(
                np.ascontiguousarray(transposed[:, :nl])))
            deltas = ref.delta(transposed, np.asarray(base), dt)
            packed_d = jax.block_until_ready(
                jnp.asarray(ref.pack(deltas, w, dt)))
            packed_v = jax.block_until_ready(
                jnp.asarray(ref.pack(transposed, w, dt)))

            # correctness (small slice)
            S = 64
            want_up = ref.untranspose(np.asarray(transposed[:S]), dt)
            got = np.asarray(jax.jit(od_unpack, static_argnums=(1, 2))(
                packed_v[:S], w, dt))
            assert np.array_equal(got, want_up), f"od_unpack WRONG {dt} w={w}"
            want_ud = ref.untranspose(ref.undelta_pack(
                np.asarray(packed_d[:S]), np.asarray(base[:S]), w, dt), dt)
            got = np.asarray(jax.jit(
                od_undelta, static_argnums=(2, 3))(
                    packed_d[:S], base[:S], w, dt))
            assert np.array_equal(got, want_ud), f"od_ud WRONG {dt} w={w}"
            print(f"# {dt} w={w}: correctness ok", flush=True)

            cands = [
                ("copy", lambda a: a ^ np_dt.type(1), x),
                ("od_unpack", lambda p: od_unpack(p, w, dt), packed_v),
                ("od_ud", lambda p: od_undelta(p, base, w, dt), packed_d),
                ("ud+gather", lambda p: untranspose_gather(
                    ops_delta.undelta_pack(p, base, w, dt)), packed_d),
            ]
            if args.only:
                keep = set(args.only.split(","))
                cands = [c for c in cands if c[0] in keep]
            for name, fn, arg in cands:
                sec = chained(fn, arg)
                print(f"{dt} w={w} {name:10s} {n_ints / sec / 1e9:8.1f} "
                      f"e9 ints/s", flush=True)


if __name__ == "__main__":
    main()
