#!/usr/bin/env python
"""Experiment: untranspose formulations race (round-3 VERDICT item 1).

Structural fact (verified in test_layout): the FastLanes transpose maps lane
l to a CONTIGUOUS T-element segment of the original order —
    orig[seg_of_lane(l) * T + r] = transposed[index(r, l)]
so untranspose is expressible as reshape + static small-axis permutes + ONE
batched (T x LANES) minor-axis transpose, instead of the (16,8,8) permute the
current ops/transpose.py uses. This script races the candidates on real
hardware with the optimization_barrier chained harness (tune_routing.py's).

Variants (standalone untranspose of a (B, 1024) transposed array):
  cur      current ops.transpose.untranspose ((B,16,8,8) permute)
  seg      segment form: (B,T,nl) -> minor transpose -> lane perm
  segG     segment form grouped G blocks wide: minor transpose at (T, G*nl)
  gather   x[:, untranspose_perm] static minor gather
  mxu      identity-matmul transpose on 16-bit planes (dot_general, f32)
  copy     x ^ 1 materialized copy (SoL reference)

Fused decode variants (packed -> original order, one jit):
  ud+cur   ops undelta_pack then current untranspose
  ud+segG  ops undelta_pack then grouped segment untranspose
  ud_orig  undelta row stream assembled DIRECTLY to original order (segG)

Usage: python benchmarks/exp_untranspose.py [--dtypes u32,...] [--blocks N]
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
from fastlanes_tpu.ops import _engine as eng  # noqa: E402
from fastlanes_tpu.ops import bitpack as ops_bitpack  # noqa: E402
from fastlanes_tpu.ops import delta as ops_delta  # noqa: E402
from fastlanes_tpu.ops import transpose as ops_transpose  # noqa: E402
from fastlanes_tpu.ref import numpy_ref as ref  # noqa: E402


def seg_of_lane(dtype) -> np.ndarray:
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    return np.array([layout.transpose_index(layout.index(0, l, dtype)) // t
                     for l in range(nl)], np.int32)


def lane_of_seg(dtype) -> np.ndarray:
    s = seg_of_lane(dtype)
    inv = np.empty_like(s)
    inv[s] = np.arange(len(s), dtype=np.int32)
    return inv


def _rows_to_R(x2d, dtype):
    """Transposed flat (B, 1024) -> (B, T, nl) natural row-major view."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    b = x2d.shape[0]
    n_o = t // 8
    order = list(layout.row_order_by_offset(dtype))  # x col-group k holds o=order[k]
    inv = [0] * n_o
    for k, o in enumerate(order):
        inv[o] = k
    y = x2d.reshape(b, 8, n_o, nl)[:, :, inv, :]     # (B, s, a, nl), natural a
    return y.transpose(0, 2, 1, 3).reshape(b, t, nl)  # (B, r=a*8+s, nl)


def untranspose_seg(x2d, dtype):
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    b = x2d.shape[0]
    R = _rows_to_R(x2d, dtype)
    Y = R.transpose(0, 2, 1)                          # (B, nl, T) minor transpose
    return Y[:, lane_of_seg(dtype), :].reshape(b, 1024)


def untranspose_segG(x2d, dtype, G=4):
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    b = x2d.shape[0]
    if b % G:
        return untranspose_seg(x2d, dtype)
    R = _rows_to_R(x2d, dtype)                        # (B, T, nl)
    R4 = R.reshape(b // G, G, t, nl).transpose(0, 2, 1, 3).reshape(b // G, t, G * nl)
    Y = R4.transpose(0, 2, 1)                         # (B/G, G*nl, T) wide minor transpose
    Y = Y.reshape(b // G, G, nl, t)[:, :, lane_of_seg(dtype), :]
    return Y.reshape(b, 1024)


def untranspose_gather(x2d, dtype):
    perm = jnp.asarray(layout.untranspose_perm())
    return x2d[:, perm]


def untranspose_mxu(x2d, dtype):
    """u32 only: (B,T,nl) -> (B,nl,T) via dot_general(X, I) contracting the
    row axis — the MXU loads the operand transposed, so the systolic array
    does the relayout. 16-bit planes in f32 stay exact."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    b = x2d.shape[0]
    R = _rows_to_R(x2d, dtype)
    eye = jnp.eye(t, dtype=jnp.float32)
    los = (R & jnp.uint32(0xFFFF)).astype(jnp.float32)
    his = (R >> jnp.uint32(16)).astype(jnp.float32)
    def tr(p):
        # out[b, l, s] = sum_r p[b, r, l] * I[r, s] = p[b, s, l] — the MXU
        # loads the lhs transposed, so the systolic array does the relayout
        o = jnp.einsum("brl,rs->bls", p, eye,
                       preferred_element_type=jnp.float32)
        return o.astype(jnp.uint32)
    Y = tr(los) | (tr(his) << jnp.uint32(16))         # (B, nl, T)
    return Y[:, lane_of_seg(dtype), :].reshape(b, 1024)


def assemble_orig(rows_by_row, dtype, G=4):
    """Direct original-order assembly from the decode row stream (the fused
    untranspose): stack rows wide, one minor transpose, lane perm."""
    t, nl = layout.bit_width(dtype), layout.lanes(dtype)
    b = rows_by_row[0].shape[0]
    if b % G:
        G = 1
    R4 = jnp.stack([rows_by_row[r].reshape(b // G, G * nl) for r in range(t)],
                   axis=1)                            # (B/G, T, G*nl)
    Y = R4.transpose(0, 2, 1)                         # (B/G, G*nl, T)
    Y = Y.reshape(b // G, G, nl, t)[:, :, lane_of_seg(dtype), :]
    return Y.reshape(b, 1024)


def undelta_pack_orig(packed, base, width, dtype, G=4):
    """ops undelta_pack emitting original order directly."""
    vec = eng.to_vec(packed, dtype)
    vec, _ = eng.promote_shape(vec, dtype)
    prev = eng.to_vec(base, dtype)
    rows = {}
    for row, elem in ops_bitpack.unpack_row_stream(vec, width, dtype):
        prev = eng.add(elem, prev, dtype)
        rows[row] = prev
    return assemble_orig(rows, dtype, G=G)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="u32")
    ap.add_argument("--blocks", type=int, default=16384)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--width", type=int, default=3)
    ap.add_argument("--groups", default="2,4,8")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()

    n_blocks, K = args.blocks, args.k
    rng = np.random.default_rng(0)

    def chained(fn, main, *rest):
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
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = np.asarray(rep(main))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / K

    for dt in args.dtypes.split(","):
        if dt == "u64":
            print("# u64: limb handling not in this experiment yet")
            continue
        t = layout.bit_width(dt)
        nl = layout.lanes(dt)
        np_dt = layout.np_dtype(dt)
        w = min(args.width, t)
        n_ints = n_blocks * 1024
        values = rng.integers(0, 1 << w, (n_blocks, 1024), dtype=np.uint64).astype(np_dt)
        transposed = ref.transpose(values, dt)
        x = jax.block_until_ready(jnp.asarray(transposed))
        base = jax.block_until_ready(jnp.asarray(np.ascontiguousarray(
            transposed[:, :nl])))
        # packed deltas for the fused variants (deltas over the transposed
        # domain, like the FLT delta codec: transpose -> delta -> pack)
        deltas = ref.delta(transposed, np.asarray(base), dt)
        packed_d = jax.block_until_ready(jnp.asarray(ref.pack(deltas, w, dt)))

        # correctness spot checks (small slice, compiled once)
        small = x[:64]
        want = ref.untranspose(np.asarray(small), dt)
        for name, fn in [("seg", untranspose_seg), ("segG", untranspose_segG),
                         ("gather", untranspose_gather)] + (
                [("mxu", untranspose_mxu)] if dt == "u32" else []):
            got = np.asarray(jax.jit(fn, static_argnums=1)(small, dt))
            assert np.array_equal(got, want), f"{name} WRONG for {dt}"
        got = np.asarray(jax.jit(undelta_pack_orig, static_argnums=(2, 3))(
            packed_d[:64], base[:64], w, dt))
        want_d = ref.untranspose(ref.undelta_pack(
            np.asarray(packed_d[:64]), np.asarray(base[:64]), w, dt), dt)
        assert np.array_equal(got, want_d), f"ud_orig WRONG for {dt}"
        print(f"# {dt}: correctness ok")

        cands = [("copy", lambda a: a ^ np_dt.type(1), x),
                 ("cur", lambda a: ops_transpose.untranspose(a, dt), x),
                 ("seg", lambda a: untranspose_seg(a, dt), x)]
        for G in map(int, args.groups.split(",")):
            cands.append((f"segG{G}",
                          lambda a, _G=G: untranspose_segG(a, dt, _G), x))
        cands.append(("gather", lambda a: untranspose_gather(a, dt), x))
        if dt == "u32":
            cands.append(("mxu", lambda a: untranspose_mxu(a, dt), x))
        cands += [
            ("ud+cur", lambda p: ops_transpose.untranspose(
                ops_delta.undelta_pack(p, base, w, dt), dt), packed_d),
            ("ud+segG4", lambda p: untranspose_segG(
                ops_delta.undelta_pack(p, base, w, dt), dt, 4), packed_d),
        ]
        for G in map(int, args.groups.split(",")):
            cands.append((f"ud_orig{G}",
                          lambda p, _G=G: undelta_pack_orig(p, base, w, dt, _G),
                          packed_d))
        cands.append(("ud+gather", lambda p: untranspose_gather(
            ops_delta.undelta_pack(p, base, w, dt), dt), packed_d))
        if args.only:
            keep = set(args.only.split(","))
            cands = [c for c in cands if c[0] in keep]
        for name, fn, arg in cands:
            sec = chained(fn, arg)
            print(f"{dt} {name:10s} {n_ints / sec / 1e9:8.1f} e9 ints/s",
                  flush=True)


if __name__ == "__main__":
    main()
