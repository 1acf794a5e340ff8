#!/usr/bin/env python
"""FastLanes-TPU benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric: u32 W=3 decode (unpack) throughput per chip in integers/s
through the PUBLIC entry point (kernels.unpack in auto mode — the measured
fastest path per config via kernels.routing), with forced-Pallas and
forced-XLA-ops measurements recorded alongside.

Harness: K iterations chained inside one jit (lax.scan with a data
dependency between iterations), each iteration's FULL output passed through
jax.lax.optimization_barrier so XLA must materialize every element — no DCE
behind a scalar probe, no fusing the probe into the producer — exactly the
work the opaque Pallas kernel does. One scalar host fetch per repetition
(the remote tunnel acks block_until_ready at enqueue; benchmarks/NOTES.md).

Roofline honesty: each materialized path also reports `sol_frac`, its
fraction of the HBM speed-of-light for the bytes it must move
(read n*W/8 packed bytes + write n*elem decoded bytes at HBM_GBPS).

Baseline: the north-star target of >100e9 u32 ints/s on a v5e-8 slice
(BASELINE.json) = 12.5e9 ints/s per chip; vs_baseline = value / 12.5e9.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

HBM_GBPS = 819.0  # TPU v5e HBM bandwidth (16 GB HBM2 @ ~819 GB/s)


def _timed_scalar(rep_fn, arg, k, iters=5):
    """Median seconds per chained iteration; rep_fn returns a scalar whose
    host fetch forces completion."""
    _ = np.asarray(rep_fn(arg))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(rep_fn(arg))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / k


# FASTLANES_TPU_PLATFORM=cpu forces the jax platform BEFORE backend init
# (a site-installed accelerator plugin beats the JAX_PLATFORMS env var,
# and a dead remote-TPU tunnel hangs backend setup).
import os as _os

if _os.environ.get("FASTLANES_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FASTLANES_TPU_PLATFORM"])
else:
    # Dead-tunnel guard: a hung remote-TPU plugin blocks backend init
    # forever, which would leave the bench with NO output at all. Probe
    # device enumeration in a subprocess with a timeout; on failure fall
    # back to CPU (the JSON records platform, so a CPU number is clearly
    # labeled rather than silently absent).
    import subprocess as _sp
    import sys as _sys

    try:
        _sp.run([_sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, check=True,
                stdout=_sp.DEVNULL, stderr=_sp.DEVNULL)
    except Exception:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        print("bench.py: accelerator backend init failed/hung; "
              "falling back to platform=cpu", file=_sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from fastlanes_tpu.core import layout
    from fastlanes_tpu.ops import bitpack
    from fastlanes_tpu.kernels import pallas_codecs as pk
    from fastlanes_tpu.ref import numpy_ref as ref

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    W, DT = 3, "u32"
    # chain length: the remote-device tunnel adds ~26ms fixed overhead per
    # host call; K=512 amortizes it to <0.1ms/iter (measured asymptote —
    # K=32 under-reported throughput by ~40%)
    K = 512 if on_tpu else 4
    n_blocks = 131072 if on_tpu else 2048
    n_ints = n_blocks * layout.BLOCK
    raw_gb = n_ints * 4 / 1e9
    # HBM speed of light for materialized u32 W=3 decode: read 3/32 * 4 B/int
    # packed + write 4 B/int values
    decode_bytes_per_int = 4 * W / 32 + 4
    encode_bytes_per_int = 4 + 4 * W / 32
    sol_decode = HBM_GBPS * 1e9 / decode_bytes_per_int
    sol_encode = HBM_GBPS * 1e9 / encode_bytes_per_int

    rng = np.random.default_rng(0)
    values_np = rng.integers(0, 1 << W, (n_blocks, layout.BLOCK), dtype=np.int64).astype(np.uint32)
    packed_np = ref.pack(values_np, W, DT)
    values = jnp.asarray(values_np)
    packed = jnp.asarray(packed_np)

    # correctness gate before timing: the routed public entry vs the oracle
    got = np.asarray(jax.jit(lambda p: pk.unpack(p, W, DT))(packed))
    assert np.array_equal(got, values_np), "routed unpack mismatch vs oracle"

    results = {}

    def chained_materialized(fn):
        """Materialize-everything chain (fair across Pallas and XLA ops)."""
        @jax.jit
        def rep(x):
            def body(c, _):
                out = fn(jnp.bitwise_xor(x, c))
                out = jax.lax.optimization_barrier(out)
                nc = jnp.where(out.reshape(-1)[0] < jnp.uint32(0xFFFFFFFF),
                               jnp.uint32(0), jnp.uint32(1))
                return nc.astype(x.dtype), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=K)
            return c
        return rep

    def chained_roundtrip(unpack_fn, pack_fn):
        @jax.jit
        def rep(p):
            def body(c, _):
                return pack_fn(unpack_fn(c)), ()
            c, _ = jax.lax.scan(body, p, None, length=K)
            return jnp.sum(c[:4, :4].astype(jnp.uint32))
        return rep

    def chained_consume(fn):
        """Decode fused into an on-chip consumer (sum) — the composition the
        FastLanes layout exists for; intermediates never reach HBM."""
        @jax.jit
        def rep(x):
            def body(c, _):
                out = fn(jnp.bitwise_xor(x, c))
                return jnp.sum(out, dtype=jnp.uint32) & jnp.uint32(1), ()
            c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=K)
            return c
        return rep

    def measure_materialized(tag, fn, arg, sol):
        t = _timed_scalar(chained_materialized(fn), arg, K)
        results[f"{tag}_ints_per_s"] = n_ints / t
        results[f"{tag}_sol_frac"] = (n_ints / t) / sol

    # the DEFAULT public path (kernels.routing picks the winner per config)
    measure_materialized("routed_decode", lambda p: pk.unpack(p, W, DT),
                         packed, sol_decode)
    # forced XLA ops
    measure_materialized("ops_decode", lambda p: bitpack.unpack(p, W, DT),
                         packed, sol_decode)

    # ENCODE through the public fused-encode entry kernels.pack_map: the
    # chain's per-iteration producer (xor with the carry) is applied per
    # row-slice read, so XLA fuses it into the packed-word production —
    # exactly the work a user's on-device encode does (read input once,
    # write packed words). Perturbing the WHOLE input array instead
    # (pack(x ^ c)) makes XLA materialize the producer — its output has
    # many overlapping slice consumers — charging a spurious extra
    # read+write of the input per iteration; that variant is recorded
    # below as encode_materialized_producer (benchmarks/NOTES.md).
    @jax.jit
    def rep_encode_user(x):
        def body(c, _):
            out = pk.pack_map(lambda v: v ^ c, x, W, DT)
            out = jax.lax.optimization_barrier(out)
            nc = jnp.where(out.reshape(-1)[0] < jnp.uint32(0xFFFFFFFF),
                           jnp.uint32(0), jnp.uint32(1))
            return nc, ()
        c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=K)
        return c
    t = _timed_scalar(rep_encode_user, values, K)
    results["routed_encode_ints_per_s"] = n_ints / t
    results["routed_encode_sol_frac"] = (n_ints / t) / sol_encode

    # the materialized-producer harness variant (the round-1/2 number)
    measure_materialized("encode_materialized_producer",
                         lambda v: pk.pack(v, W, DT), values, sol_encode)
    measure_materialized("ops_encode", lambda v: bitpack.pack(v, W, DT),
                         values, sol_encode)

    # fused FoR encode (for_pack): a real codec entry whose scalar reference
    # carries the chain dependency — no input perturbation at all
    @jax.jit
    def rep_encode_for(x):
        def body(c, _):
            out = pk.for_pack(x, c, W, DT)
            out = jax.lax.optimization_barrier(out)
            nc = jnp.where(out.reshape(-1)[0] < jnp.uint32(0xFFFFFFFF),
                           jnp.uint32(0), jnp.uint32(1))
            return nc, ()
        c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=K)
        return c
    t = _timed_scalar(rep_encode_for, values, K)
    results["for_encode_ints_per_s"] = n_ints / t
    results["for_encode_sol_frac"] = (n_ints / t) / sol_encode

    # original-order fused decode (the delta/zdelta/rle FILE-READ path:
    # kernels.undelta_pack_orig — untranspose fused, VERDICT r2 item 1).
    # Input: a sorted column (what the delta codec actually stores), so the
    # packed width is the realistic gap width, not 32.
    nl32 = layout.lanes(DT)
    sorted_np = np.sort(rng.integers(0, 1 << 30, (n_blocks, layout.BLOCK),
                                     dtype=np.int64).astype(np.uint32), axis=1)
    tr_np = ref.transpose(sorted_np, DT)
    base32 = jnp.asarray(np.ascontiguousarray(tr_np[:, :nl32]))
    deltas_np = ref.delta(tr_np, np.asarray(base32), DT)
    wd = max(int(deltas_np.max()).bit_length(), 1)
    packed_d = jnp.asarray(ref.pack(deltas_np, wd, DT))
    sol_orig = HBM_GBPS * 1e9 / (4 * wd / 32 + 4)

    @jax.jit
    def rep_orig(x):
        def body(c, _):
            out = pk.undelta_pack_orig(jnp.bitwise_xor(x, c), base32, wd, DT)
            out = jax.lax.optimization_barrier(out)
            nc = jnp.where(out.reshape(-1)[0] < jnp.uint32(0xFFFFFFFF),
                           jnp.uint32(0), jnp.uint32(1))
            return nc.astype(x.dtype), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=K)
        return c
    t = _timed_scalar(rep_orig, packed_d, K)
    results["undelta_orig_w%d_ints_per_s" % wd] = n_ints / t
    results["undelta_orig_w%d_sol_frac" % wd] = (n_ints / t) / sol_orig

    # u64 W=3 materialized decode, separate limb planes (the performance
    # output form; the interleaved image pays a strided stack)
    v64 = rng.integers(0, 1 << W, (n_blocks // 2, layout.BLOCK),
                       dtype=np.int64).astype(np.uint64)
    p64 = jnp.asarray(np.ascontiguousarray(ref.pack(v64, W, "u64"))
                      .view(np.uint32).reshape(n_blocks // 2, -1, 2))
    n64 = v64.size

    def unpack64_planes(x):
        lo, hi = bitpack.unpack_planes(x, W, "u64")
        return jnp.concatenate([lo, hi], axis=-1)

    @jax.jit
    def rep64(x):
        def body(c, _):
            out = jax.lax.optimization_barrier(
                unpack64_planes(jnp.bitwise_xor(x, c)))
            nc = jnp.where(out.reshape(-1)[0] < jnp.uint32(0xFFFFFFFF),
                           jnp.uint32(0), jnp.uint32(1))
            return nc.astype(jnp.uint32), ()
        c, _ = jax.lax.scan(body, jnp.uint32(0), None, length=K)
        return c
    t = _timed_scalar(rep64, p64, K)
    sol_u64 = HBM_GBPS * 1e9 / (8 * W / 64 + 8)
    results["u64_decode_planes_ints_per_s"] = n64 / t
    results["u64_decode_planes_sol_frac"] = (n64 / t) / sol_u64

    # fused decode+consumer and packed->packed round trip (XLA compositions)
    t = _timed_scalar(chained_consume(lambda p: bitpack.unpack(p, W, DT)), packed, K)
    results["ops_fused_decode_ints_per_s"] = n_ints / t
    t = _timed_scalar(
        chained_roundtrip(lambda p: bitpack.unpack(p, W, DT),
                          lambda v: bitpack.pack(v, W, DT)), packed, K)
    results["ops_roundtrip_ints_per_s"] = n_ints / t
    results["ops_encdec_GBps"] = 2 * raw_gb / t

    if on_tpu:
        try:
            # forced Pallas kernel (compiled)
            measure_materialized(
                "pallas_decode", lambda p: pk.unpack(p, W, DT, interpret=False),
                packed, sol_decode)
            measure_materialized(
                "pallas_encode", lambda v: pk.pack(v, W, DT, interpret=False),
                values, sol_encode)
        except Exception as e:  # pragma: no cover
            results["pallas_error"] = str(e)[:200]

    headline = results["routed_decode_ints_per_s"]
    path = "routed_decode(auto)"

    results["platform"] = platform
    results["path"] = path
    results["n_blocks"] = n_blocks
    results["hbm_gbps_assumed"] = HBM_GBPS

    per_chip_target = 100e9 / 8  # north star: 100e9 ints/s across 8 chips
    print(json.dumps({
        "metric": "u32_w3_decode_ints_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "ints/s",
        "vs_baseline": round(headline / per_chip_target, 4),
        "extra": {k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
