#!/usr/bin/env python
"""Round-4 experiment: original-order decode formulations (VERDICT r3 items 1-2).

BENCH_r03 exposed the od (output-domain) formulation at 2.6% of SoL at W=25:
ops/orig._natural_unpack does W lane-repeat broadcasts to (B, 1024) plus ~2W
full-width selects — O(W) full-block passes. This experiment races it against
two O(1)-pass candidates that move ALL relayout onto the PACKED image (W/T of
the output bytes) and produce the original order directly:

  gat   one static jnp.take per operand: words[b,s,r] = vec[b, k(r)*NL +
        lane_of_seg(s)] (and the straddle next-word twin), then a single
        vectorized shift/or/mask pass; delta decode = cumsum on the minor axis
        (positions within a segment ARE rows, SURVEY §2 contiguity fact).
  rep   same math, but the word arrays come from a packed-domain relayout
        ((B,W,NL) -> lane-permuted (B,NL,W) transpose) + static-count
        jnp.repeat along the minor axis — no gather HLO.

plus the existing strategies:

  od       current output-domain select chain (ops/orig.py)
  compose  routed transposed decode + standalone untranspose

Correctness is asserted against the NumPy oracle before any timing.
Reference semantics: macros.rs:101-174 (unified two-word extract) composed
with transpose.rs:18-22 and delta.rs:36-45.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fastlanes_tpu.core import layout
from fastlanes_tpu.ops import orig as ops_orig
from fastlanes_tpu.kernels import pallas_codecs as pk
from fastlanes_tpu.ref import numpy_ref as ref


def _static_tables(width, dtype):
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    r = np.arange(t, dtype=np.int64)
    k = (r * width) // t
    sh = (r * width) % t
    need = (sh + width > t) & (k + 1 < width)
    kn = np.minimum(k + 1, width - 1)
    lane_perm = np.asarray(ops_orig._lane_of_seg(dtype), np.int64)
    return t, nl, r, k, sh, need, kn, lane_perm


def unpack_orig_gat(vec, width, dtype):
    """words/next via one static flat gather each."""
    t, nl, r, k, sh, need, kn, lane_perm = _static_tables(width, dtype)
    np_dt = layout.np_dtype(dtype)
    b = vec.shape[0]
    if width == 0:
        return jnp.zeros((b, layout.BLOCK), jnp.dtype(np_dt.name))
    IDXW = (k[None, :] * nl + lane_perm[:, None]).astype(np.int32)  # (NL, T)
    words = jnp.take(vec, jnp.asarray(IDXW), axis=-1)               # (B,NL,T)
    SH = jnp.asarray(sh.astype(np_dt))
    out = words >> SH
    if need.any():
        IDXN = (kn[None, :] * nl + lane_perm[:, None]).astype(np.int32)
        nxt = jnp.take(vec, jnp.asarray(IDXN), axis=-1)
        SL = jnp.asarray(((t - sh) % t).astype(np_dt))
        out = jnp.where(jnp.asarray(need), out | (nxt << SL), out)
    if width < t:
        out = out & np_dt.type((1 << width) - 1)
    return out.reshape(b, layout.BLOCK)


def unpack_orig_rep(vec, width, dtype):
    """packed-domain relayout + static-count repeat (no gather HLO)."""
    t, nl, r, k, sh, need, kn, lane_perm = _static_tables(width, dtype)
    np_dt = layout.np_dtype(dtype)
    b = vec.shape[0]
    if width == 0:
        return jnp.zeros((b, layout.BLOCK), jnp.dtype(np_dt.name))
    pt = jnp.transpose(vec.reshape(b, width, nl)[:, :, jnp.asarray(lane_perm)],
                       (0, 2, 1))                                    # (B,NL,W)
    reps = np.bincount(k, minlength=width)
    words = jnp.repeat(pt, jnp.asarray(reps), axis=-1,
                       total_repeat_length=t)                        # (B,NL,T)
    SH = jnp.asarray(sh.astype(np_dt))
    out = words >> SH
    if need.any():
        ptn = jnp.concatenate([pt[:, :, 1:], pt[:, :, -1:]], axis=-1)
        nxt = jnp.repeat(ptn, jnp.asarray(reps), axis=-1,
                         total_repeat_length=t)
        SL = jnp.asarray(((t - sh) % t).astype(np_dt))
        out = jnp.where(jnp.asarray(need), out | (nxt << SL), out)
    if width < t:
        out = out & np_dt.type((1 << width) - 1)
    return out.reshape(b, layout.BLOCK)


def unpack_orig_gatf(vec, width, dtype):
    """Flat-form gat: the index/shift vectors are (1024,) so every op runs
    on (B, 1024) full-lane shapes; no (B, NL, T) intermediate (whose 32-wide
    minor pads to 128 lanes)."""
    t, nl, r, k, sh, need, kn, lane_perm = _static_tables(width, dtype)
    np_dt = layout.np_dtype(dtype)
    b = vec.shape[0]
    if width == 0:
        return jnp.zeros((b, layout.BLOCK), jnp.dtype(np_dt.name))
    IDXW = (k[None, :] * nl + lane_perm[:, None]).reshape(-1).astype(np.int32)
    words = jnp.take(vec, jnp.asarray(IDXW), axis=-1)            # (B, 1024)
    SH = jnp.asarray(np.tile(sh, nl).astype(np_dt))
    out = words >> SH
    if need.any():
        IDXN = (kn[None, :] * nl + lane_perm[:, None]).reshape(-1).astype(np.int32)
        nxt = jnp.take(vec, jnp.asarray(IDXN), axis=-1)
        SL = jnp.asarray(np.tile((t - sh) % t, nl).astype(np_dt))
        out = jnp.where(jnp.asarray(np.tile(need, nl)), out | (nxt << SL), out)
    if width < t:
        out = out & np_dt.type((1 << width) - 1)
    return out


def unpack_orig_repf(vec, width, dtype):
    """Flat-form rep: packed relayout to (B, NL*W) flat lane-major, repeat
    with static counts to (B, 1024), full-lane shift/or/mask."""
    t, nl, r, k, sh, need, kn, lane_perm = _static_tables(width, dtype)
    np_dt = layout.np_dtype(dtype)
    b = vec.shape[0]
    if width == 0:
        return jnp.zeros((b, layout.BLOCK), jnp.dtype(np_dt.name))
    pt = jnp.transpose(vec.reshape(b, width, nl)[:, :, jnp.asarray(lane_perm)],
                       (0, 2, 1)).reshape(b, nl * width)          # (B, NL*W)
    reps = np.bincount(k, minlength=width)
    words = jnp.repeat(pt, jnp.asarray(np.tile(reps, nl)), axis=-1,
                       total_repeat_length=layout.BLOCK)          # (B, 1024)
    SH = jnp.asarray(np.tile(sh, nl).astype(np_dt))
    out = words >> SH
    if need.any():
        pt3 = pt.reshape(b, nl, width)
        ptn = jnp.concatenate([pt3[:, :, 1:], pt3[:, :, -1:]],
                              axis=-1).reshape(b, nl * width)
        nxt = jnp.repeat(ptn, jnp.asarray(np.tile(reps, nl)), axis=-1,
                         total_repeat_length=layout.BLOCK)
        SL = jnp.asarray(np.tile((t - sh) % t, nl).astype(np_dt))
        out = jnp.where(jnp.asarray(np.tile(need, nl)), out | (nxt << SL), out)
    if width < t:
        out = out & np_dt.type((1 << width) - 1)
    return out


def undelta_orig_of(unpack3_fn):
    """Wrap an (un-reshaped) natural-order decode into the fused delta decode:
    cumsum along the minor axis + permuted base."""
    def fn(vec, base, width, dtype):
        t = layout.bit_width(dtype)
        nl = layout.lanes(dtype)
        b = vec.shape[0]
        out3 = unpack3_fn(vec, width, dtype).reshape(b, nl, t)
        lane_perm = jnp.asarray(
            np.asarray(ops_orig._lane_of_seg(dtype), np.int64))
        cum = jnp.cumsum(out3, axis=-1, dtype=out3.dtype)
        cum = cum + base[:, lane_perm][:, :, None]
        return cum.reshape(b, layout.BLOCK)
    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16384)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--dtypes", default="u32")
    ap.add_argument("--widths", default="")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    n_blocks = args.blocks if platform == "tpu" else 64
    K = args.k if platform == "tpu" else 2
    rng = np.random.default_rng(0)

    def chained(fn, main, *rest, iters=5):
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
        _ = np.asarray(rep(main))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _ = np.asarray(rep(main))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / K

    for dt in args.dtypes.split(","):
        t = layout.bit_width(dt)
        nl = layout.lanes(dt)
        np_dt = layout.np_dtype(dt)
        widths = ([int(w) for w in args.widths.split(",") if w]
                  or sorted({1, 3, t // 4, t // 2, t - 7, t - 2, t}))
        widths = [w for w in widths if 1 <= w <= t]
        for w in widths:
            values = rng.integers(0, 1 << min(w, t), (n_blocks, 1024),
                                  dtype=np.uint64).astype(np_dt)
            packed_np = ref.pack(values, w, dt)
            # original-order expectation for unpack_orig
            want_unpack = ref.untranspose(ref.unpack(packed_np, w, dt), dt)
            # delta inputs: base = transposed row 0
            tr = ref.transpose(values, dt)
            base_np = np.ascontiguousarray(tr[:, :nl])
            deltas = ref.delta(tr, base_np, dt)
            packed_d_np = ref.pack(deltas, w, dt)
            # expected through the oracle (w-bit packing truncates random
            # deltas, so the original values are NOT recoverable here — the
            # decode spec is undelta_pack then untranspose)
            want_delta = ref.untranspose(
                ref.undelta_pack(packed_d_np, base_np, w, dt), dt)

            packed = jax.block_until_ready(jnp.asarray(packed_np))
            packed_d = jax.block_until_ready(jnp.asarray(packed_d_np))
            base = jax.block_until_ready(jnp.asarray(base_np))

            n_ints = n_blocks * 1024
            cands_u = {
                "od": lambda p: ops_orig.unpack_orig(p, w, dt),
                "compose": lambda p: pk.unpack_orig(p, w, dt,
                                                    strategy="compose"),
                "gat": lambda p: unpack_orig_gat(p, w, dt),
                "rep": lambda p: unpack_orig_rep(p, w, dt),
                "gatf": lambda p: unpack_orig_gatf(p, w, dt),
                "repf": lambda p: unpack_orig_repf(p, w, dt),
            }
            und_gat = undelta_orig_of(unpack_orig_gat)
            und_rep = undelta_orig_of(unpack_orig_rep)
            und_gatf = undelta_orig_of(unpack_orig_gatf)
            und_repf = undelta_orig_of(unpack_orig_repf)
            cands_d = {
                "od": lambda p: ops_orig.undelta_pack_orig(p, base, w, dt),
                "compose": lambda p: pk.undelta_pack_orig(
                    p, base, w, dt, strategy="compose"),
                "gat": lambda p: und_gat(p, base, w, dt),
                "rep": lambda p: und_rep(p, base, w, dt),
                "gatf": lambda p: und_gatf(p, base, w, dt),
                "repf": lambda p: und_repf(p, base, w, dt),
            }
            for op, cands, arg, want in (
                    ("unpack_orig", cands_u, packed, want_unpack),
                    ("undelta_pack_orig", cands_d, packed_d, want_delta)):
                rec = {}
                for name, fn in cands.items():
                    got = np.asarray(jax.jit(fn)(arg))
                    if not np.array_equal(got, want):
                        rec[name] = "WRONG"
                        continue
                    try:
                        t_s = chained(fn, arg)
                        rec[name] = round(n_ints / t_s / 1e9, 2)
                    except Exception as e:  # pragma: no cover
                        rec[name] = f"ERR {str(e)[:60]}"
                print(json.dumps({"op": op, "dt": dt, "w": w,
                                  "Gints_per_s": rec}), flush=True)


if __name__ == "__main__":
    main()
