#!/usr/bin/env python
"""Sweep Pallas tile_b for the headline u32 W=3 decode kernel on the real
chip; prints ints/s per tile size. Informs DEFAULT_TILE_B / _TILE_BY_DTYPE."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from fastlanes_tpu.core import layout
    from fastlanes_tpu.kernels import pallas_codecs as pk
    from fastlanes_tpu.ref import numpy_ref as ref

    W, DT = (int(sys.argv[1]) if len(sys.argv) > 1 else 3,
             sys.argv[2] if len(sys.argv) > 2 else "u32")
    n_blocks = 131072
    K = 16
    rng = np.random.default_rng(0)
    values = rng.integers(0, 1 << W, (n_blocks, layout.BLOCK), np.int64).astype(
        layout.np_dtype(DT))
    packed_np = np.ascontiguousarray(ref.pack(values, W, DT))
    if DT == "u64":  # limb image (..., 2) uint32
        packed_np = packed_np.view(np.uint32).reshape(*packed_np.shape, 2)
    packed = jnp.asarray(packed_np)
    n_ints = n_blocks * layout.BLOCK

    for tile_b in (32, 64, 128, 256, 512):
        def chained(p, tile_b=tile_b):
            def body(c, _):
                out = pk.unpack(p ^ c, W, DT, tile_b=tile_b)
                probe = out.reshape(-1)[0]
                top = np.dtype(str(probe.dtype)).type(
                    np.iinfo(np.dtype(str(probe.dtype))).max)
                nc = jnp.where(probe < top, 0, 1)
                return nc.astype(p.dtype), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), p.dtype), None, length=K)
            return c

        try:
            fn = jax.jit(chained)
            _ = np.asarray(fn(packed))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                _ = np.asarray(fn(packed))
                times.append(time.perf_counter() - t0)
            t = float(np.median(times)) / K
            print(f"tile_b={tile_b:4d}  {n_ints / t / 1e9:8.1f} e9 ints/s")
        except Exception as e:
            print(f"tile_b={tile_b:4d}  FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
