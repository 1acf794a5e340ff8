#!/usr/bin/env python
"""Bisect which Mosaic ops crash the v5e remote compiler (HTTP 500).

Context (VERDICT r2 item 1): every Pallas untranspose/original-order-decode
variant in exp_untranspose_pallas.py failed with
`remote_compile: HTTP 500: tpu_compile_helper subprocess exit code 1` while
being bit-exact in interpret mode. Production kernels (2D vector ops + 3D
VMEM scratch indexed down to 2D planes) compile fine, so the crash is in the
new vocabulary: 3D vector ops (stack/swapaxes/broadcast/iota/roll), strided
middle-axis slicing, 3D out BlockSpecs, or MXU dot. This script compiles one
tiny kernel per candidate op and reports ok/fail per op.

Usage: python benchmarks/exp_mosaic_bisect.py  (real chip; ~10 min of
remote compiles)
"""

from __future__ import annotations

import sys
import traceback

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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TB = 256
NB = 512


def k_copy(x_ref, o_ref):
    o_ref[...] = x_ref[...] ^ jnp.uint32(1)


def k_stack3d(x_ref, o_ref):
    x = x_ref[...]
    rows = [x[:, 32 * r:32 * (r + 1)] for r in range(32)]
    a = jnp.stack(rows, axis=1)                 # (tb, 32, 32)
    o_ref[...] = a.reshape(TB, 1024)


def k_swap3d(x_ref, o_ref):
    a = x_ref[...].reshape(TB, 32, 32)
    a = jnp.swapaxes(a, 1, 2)
    o_ref[...] = a.reshape(TB, 1024)


def k_iota3d(x_ref, o_ref):
    r = jax.lax.broadcasted_iota(jnp.uint32, (TB, 32, 32), 2)
    o_ref[...] = x_ref[...] ^ r.reshape(TB, 1024)


def k_bcast3d(x_ref, o_ref):
    plane = x_ref[:, :32]
    rep = jnp.broadcast_to(plane[:, :, None], (TB, 32, 32))
    o_ref[...] = rep.reshape(TB, 1024)


def k_roll2d(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 5, 1)


def k_roll3d(x_ref, o_ref):
    a = x_ref[...].reshape(TB, 32, 32)
    a = pltpu.roll(a, 5, 2)
    o_ref[...] = a.reshape(TB, 1024)


def k_midslice(x_ref, o_ref):
    plane = x_ref[:, :32]
    v = plane.reshape(TB, 2, 16)
    v = jnp.concatenate([v[:, 1:2, :], v[:, 0:1, :]], axis=1)
    v = jnp.swapaxes(v, 1, 2).reshape(TB, 32)
    o_ref[...] = jnp.concatenate([v] * 32, axis=1)


def k_concat_lane(x_ref, o_ref):
    # 32-lane-group static permutation via slice+concat (the W=T relayout)
    x = x_ref[...]
    pieces = [x[:, 32 * ((r * 7) % 32):32 * ((r * 7) % 32) + 32] for r in range(32)]
    o_ref[...] = jnp.concatenate(pieces, axis=1)


def k_dot(x_ref, s_ref, o_ref):
    xb = x_ref[:, :32].astype(jnp.bfloat16)
    acc = jnp.dot(xb, s_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(jnp.uint32)


def k_cumsum2d(x_ref, o_ref):
    # log-step masked roll-scan on the lane axis (2D)
    acc = x_ref[...]
    r = jax.lax.broadcasted_iota(jnp.uint32, (TB, 1024), 1)
    s = 1
    while s < 32:
        rolled = pltpu.roll(acc, s, 1)
        acc = acc + jnp.where((r & jnp.uint32(31)) >= jnp.uint32(s), rolled,
                              jnp.zeros_like(rolled))
        s *= 2
    o_ref[...] = acc


def out3d_spec():
    return (pl.BlockSpec((TB, 32, 32), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((NB, 32, 32), jnp.uint32))


def k_out3d(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(TB, 32, 32)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 30, (NB, 1024), np.int64).astype(np.uint32))
    s = jnp.asarray(np.eye(32, 1024, dtype=np.float32), jnp.bfloat16)
    jax.block_until_ready(x)

    in_spec = pl.BlockSpec((TB, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((32, 1024), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out2 = (pl.BlockSpec((TB, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((NB, 1024), jnp.uint32))

    cases = [
        ("copy", k_copy, [in_spec], (x,), out2),
        ("stack3d", k_stack3d, [in_spec], (x,), out2),
        ("swap3d", k_swap3d, [in_spec], (x,), out2),
        ("iota3d", k_iota3d, [in_spec], (x,), out2),
        ("bcast3d", k_bcast3d, [in_spec], (x,), out2),
        ("roll2d", k_roll2d, [in_spec], (x,), out2),
        ("roll3d", k_roll3d, [in_spec], (x,), out2),
        ("midslice", k_midslice, [in_spec], (x,), out2),
        ("concat_lane", k_concat_lane, [in_spec], (x,), out2),
        ("dot", k_dot, [in_spec, s_spec], (x, s), out2),
        ("cumsum2d", k_cumsum2d, [in_spec], (x,), out2),
        ("out3d", k_out3d, [in_spec], (x,), out3d_spec()),
    ]
    if len(sys.argv) > 1:
        keep = set(sys.argv[1].split(","))
        cases = [c for c in cases if c[0] in keep]

    for name, kern, specs, arrs, (ospec, oshape) in cases:
        call = pl.pallas_call(
            kern, grid=(NB // TB,), in_specs=specs, out_specs=ospec,
            out_shape=oshape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20))
        try:
            got = np.asarray(jax.jit(call)(*arrs))
            total = int(np.uint64(got.reshape(-1)[:64].astype(np.uint64).sum()))
            print(f"{name:12s} OK   sum={total}",
                  flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:140]
            print(f"{name:12s} FAIL {msg}", flush=True)
            if "--trace" in sys.argv:
                traceback.print_exc()


if __name__ == "__main__":
    main()
