#!/usr/bin/env python
"""Experiment: W=T and wide-width decode to copy speed (round-3 VERDICT
item 2).

At W=T, `unpack` is a pure relayout: packed word r IS transposed row r, and
the assemble stage is a static permutation of the 32 (u32; 8/16 for
u16/u64-limb) LANES-wide column groups. Measured r2: 43.8e9 ints/s u32
(43% of the ~102e9 copy SoL). Candidates race (all bit-exact-checked
against the oracle before timing):

  copy      x ^ 1 materialized copy (SoL reference)
  cur       production kernels.unpack routed entry (auto)
  concat    static concat of word slices (the ops assemble, isolated)
  gather    one static 1024-lane gather x[:, perm]
  grouptake (B, G, nl) view + take along the group axis
  mxu       one-hot group-permutation einsum on 16-bit planes (the MXU
            loads lhs transposed; the systolic array does the relayout;
            exact: each output sums exactly one nonzero product)
  mxu8      same with 8-bit planes in bf16 (4 matmuls, all-exact operands)

Wide widths (16, 31) race the routed entry vs the od (output-domain)
formulation vs ops, to find the ≥75% SoL path demanded by item 2.

Usage: python benchmarks/exp_wt.py [--dtypes u32] [--blocks N] [--k 256]
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
from fastlanes_tpu.kernels import pallas_codecs as pk  # noqa: E402
from fastlanes_tpu.ops import bitpack as ops_bitpack  # noqa: E402
from fastlanes_tpu.ops import orig as ops_orig  # noqa: E402
from fastlanes_tpu.ref import numpy_ref as ref  # noqa: E402


def group_perm(dtype) -> np.ndarray:
    """Word group k of the packed W=T image -> its position in the
    transposed flat block: output group g holds word perm[g]."""
    t = layout.bit_width(dtype)
    order = layout.row_order_by_offset(dtype)
    n_o = t // 8
    perm = []
    for s in range(8):
        for k in range(n_o):
            perm.append(order[k] * 8 + s)  # assemble_blocks piece order
    return np.array(perm, np.int32)


def wt_concat(x, dtype):
    """The ops assemble isolated: concat of word slices in output order."""
    nl = layout.lanes(dtype)
    p = group_perm(dtype)
    return jnp.concatenate([x[:, int(r) * nl:(int(r) + 1) * nl] for r in p],
                           axis=1)


def wt_gather(x, dtype):
    nl = layout.lanes(dtype)
    p = group_perm(dtype)
    flat = np.repeat(p * nl, nl) + np.tile(np.arange(nl), len(p))
    return x[:, jnp.asarray(flat)]


def wt_grouptake(x, dtype):
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    b = x.shape[0]
    return jnp.take(x.reshape(b, t, nl), jnp.asarray(group_perm(dtype)),
                    axis=1).reshape(b, 1024)


def wt_mxu(x, dtype, bits=16):
    """Group permutation as a one-hot matmul on the group axis: the MXU
    does the relayout. Exact: each output element sums exactly one
    product value*1 (and zeros)."""
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    b = x.shape[0]
    jdt = x.dtype
    P = np.zeros((t, t), np.float32)
    P[np.arange(t), group_perm(dtype)] = 1.0
    X = x.reshape(b, t, nl)
    n_planes = layout.bit_width(dtype) // bits
    out = None
    for i in range(n_planes):
        plane = ((X >> jdt.type(i * bits)) &
                 jdt.type((1 << bits) - 1)).astype(jnp.float32)
        if bits <= 8:
            plane = plane.astype(jnp.bfloat16)
            Pm = jnp.asarray(P, jnp.bfloat16)
        else:
            Pm = jnp.asarray(P)
        y = jnp.einsum("hg,bgl->bhl", Pm, plane,
                       preferred_element_type=jnp.float32).astype(jdt)
        out = y if out is None else out | (y << jdt.type(i * bits))
    return out.reshape(b, 1024)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="u32")
    ap.add_argument("--blocks", type=int, default=131072)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default=None)
    ap.add_argument("--wide", action="store_true",
                    help="also race wide widths (T/2, T-1)")
    args = ap.parse_args()

    K = args.k
    rng = np.random.default_rng(0)

    def chained(fn, main_arr):
        @jax.jit
        def rep(x):
            def body(c, _):
                out = fn(jnp.bitwise_xor(x, c))
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
        if dt == "u64":
            print("# u64: race the plane forms via sweep.py instead")
            continue
        t = layout.bit_width(dt)
        np_dt = layout.np_dtype(dt)
        n_blocks = args.blocks
        n_ints = n_blocks * 1024
        vals = rng.integers(0, 1 << min(t, 63), (n_blocks, 1024),
                            dtype=np.uint64).astype(np_dt)
        tr = ref.transpose(vals, dt)
        packed = jax.block_until_ready(jnp.asarray(ref.pack(tr, t, dt)))

        # correctness gate
        small = np.asarray(packed[:32])
        want = ref.unpack(small, t, dt)
        for name, fn in (("concat", wt_concat), ("gather", wt_gather),
                         ("grouptake", wt_grouptake)):
            got = np.asarray(jax.jit(fn, static_argnums=1)(small, dt))
            assert np.array_equal(got, want), f"{name} WRONG {dt}"
        got = np.asarray(jax.jit(wt_mxu, static_argnums=(1, 2))(small, dt, 16))
        assert np.array_equal(got, want), f"mxu WRONG {dt}"
        got = np.asarray(jax.jit(wt_mxu, static_argnums=(1, 2))(small, dt, 8))
        assert np.array_equal(got, want), f"mxu8 WRONG {dt}"
        print(f"# {dt} W={t}: correctness ok", flush=True)

        cands = [
            ("copy", lambda a: a ^ np_dt.type(1)),
            ("cur", lambda a: pk.unpack(a, t, dt)),
            ("concat", lambda a: wt_concat(a, dt)),
            ("gather", lambda a: wt_gather(a, dt)),
            ("grouptake", lambda a: wt_grouptake(a, dt)),
            ("mxu", lambda a: wt_mxu(a, dt, 16)),
            ("mxu8", lambda a: wt_mxu(a, dt, 8)),
        ]
        if args.only:
            keep = set(args.only.split(","))
            cands = [c for c in cands if c[0] in keep]
        for name, fn in cands:
            sec = chained(fn, packed)
            print(f"{dt} W={t} {name:10s} {n_ints / sec / 1e9:8.1f} e9 ints/s",
                  flush=True)

        if not args.wide:
            continue
        for w in (t // 2, t - 1):
            pw = jax.block_until_ready(jnp.asarray(ref.pack(tr, w, dt)))
            wide_cands = [
                ("cur", lambda a, _w=w: pk.unpack(a, _w, dt)),
                ("ops", lambda a, _w=w: ops_bitpack.unpack(a, _w, dt)),
                ("od_orig", lambda a, _w=w: ops_orig.unpack_orig(a, _w, dt)),
            ]
            for name, fn in wide_cands:
                sec = chained(fn, pw)
                print(f"{dt} W={w} {name:10s} "
                      f"{n_ints / sec / 1e9:8.1f} e9 ints/s", flush=True)


if __name__ == "__main__":
    main()
