#!/usr/bin/env python
"""FastLanes-TPU benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: u32 W=3 decode (unpack) throughput per chip, in integers/s.
Baseline: the north-star target of >100e9 u32 ints/s on a v5e-8 slice
(BASELINE.json) = 12.5e9 ints/s per chip; vs_baseline = value / 12.5e9.

Runs on the real TPU when available (pallas kernels vs XLA ops — best of
both reported, both recorded in extra), CPU otherwise. Data lives on device;
timings use block_until_ready over repeated runs.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _median_time(fn, *args, warmup=3, iters=10):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from fastlanes_tpu.core import layout
    from fastlanes_tpu.ops import dispatch
    from fastlanes_tpu.kernels import pallas_codecs as pk
    from fastlanes_tpu.ref import numpy_ref as ref

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    W, DT = 3, "u32"
    N_BLOCKS = 32768 if on_tpu else 2048  # 32Mi values = 128 MiB raw u32
    n_ints = N_BLOCKS * layout.BLOCK

    rng = np.random.default_rng(0)
    values_np = rng.integers(0, 1 << W, (N_BLOCKS, layout.BLOCK), dtype=np.int64).astype(np.uint32)
    values = jnp.asarray(values_np)

    # encode once on device (also correctness-check a sample vs the oracle)
    ops_pack = dispatch.get("pack", DT, W)
    packed = jax.block_until_ready(ops_pack(values))
    gold = ref.pack(values_np[:64], W, DT)
    assert np.array_equal(np.asarray(packed)[:64], gold), "pack mismatch vs oracle"

    ops_unpack = dispatch.get("unpack", DT, W)
    results = {}

    t_ops_dec = _median_time(ops_unpack, packed)
    results["ops_decode_ints_per_s"] = n_ints / t_ops_dec
    t_ops_enc = _median_time(ops_pack, values)
    results["ops_encode_ints_per_s"] = n_ints / t_ops_enc

    best_dec = results["ops_decode_ints_per_s"]
    path = "xla_ops"
    if on_tpu:
        try:
            kfn = jax.jit(lambda p: pk.unpack(p, W, DT))
            out = jax.block_until_ready(kfn(packed))
            assert np.array_equal(np.asarray(out)[:64], values_np[:64])
            t_k_dec = _median_time(kfn, packed)
            results["pallas_decode_ints_per_s"] = n_ints / t_k_dec
            kpk = jax.jit(lambda v: pk.pack(v, W, DT))
            jax.block_until_ready(kpk(values))
            t_k_enc = _median_time(kpk, values)
            results["pallas_encode_ints_per_s"] = n_ints / t_k_enc
            if results["pallas_decode_ints_per_s"] > best_dec:
                best_dec = results["pallas_decode_ints_per_s"]
                path = "pallas"
        except Exception as e:  # pragma: no cover
            results["pallas_error"] = str(e)[:200]

    # decode GB/s of decoded bytes (4 B/int), the reference bench's byte metric
    results["decode_GBps"] = best_dec * 4 / 1e9
    results["platform"] = platform
    results["path"] = path
    results["n_blocks"] = N_BLOCKS

    per_chip_target = 100e9 / 8  # north star: 100e9 ints/s on 8 chips
    print(json.dumps({
        "metric": "u32_w3_decode_ints_per_sec_per_chip",
        "value": round(best_dec, 1),
        "unit": "ints/s",
        "vs_baseline": round(best_dec / per_chip_target, 4),
        "extra": {k: (round(v, 1) if isinstance(v, float) else v)
                  for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
