"""Validate ALL compiled Pallas kernels on the real TPU chip vs the NumPy
oracle (run outside pytest: pytest forces the CPU backend).

Usage: python tools/validate_tpu.py [--quick]
"""
import sys
import numpy as np

sys.path.insert(0, ".")

# FASTLANES_TPU_PLATFORM=cpu forces the jax platform BEFORE backend init
# (a site-installed accelerator plugin beats the JAX_PLATFORMS env var,
# and a dead remote-TPU tunnel hangs backend setup).
import os as _os

if _os.environ.get("FASTLANES_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FASTLANES_TPU_PLATFORM"])
from fastlanes_tpu.core import layout
from fastlanes_tpu.kernels import pallas_codecs as pk
from fastlanes_tpu.ref import numpy_ref as ref

QUICK = "--quick" in sys.argv
rng = np.random.default_rng(0xFA57)


def to_jax_form(a, dt):
    if layout.canon_dtype(dt) == "u64":
        return np.ascontiguousarray(a).view("<u4").reshape(*a.shape, 2)
    return a


def from_jax_form(a, dt):
    out = np.asarray(a)
    if layout.canon_dtype(dt) == "u64":
        return np.ascontiguousarray(out).view("<u8").reshape(out.shape[:-1])
    return out


def rand(dt, w, n):
    t = layout.bit_width(dt)
    v = rng.integers(0, 1 << min(w, t), size=(n, 1024), dtype=np.uint64)
    return v.astype(layout.np_dtype(dt))


fails = []


def check(name, got, want):
    ok = np.array_equal(got, want)
    print(("PASS" if ok else "FAIL"), name, flush=True)
    if not ok:
        bad = np.argwhere(got != want)
        print("   ", len(bad), "mismatches; first:", bad[0] if len(bad) else None)
        fails.append(name)


N = 200  # 1.5+ tiles for u32 -> exercises grid + padding
for dt in layout.DTYPES:
    t = layout.bit_width(dt)
    widths = [3] if QUICK else sorted({1, 3, 7, t // 2, t - 1, t})
    nl = layout.lanes(dt)
    for w in widths:
        if w < 1 or w > t:
            continue
        values = rand(dt, w, N)
        gold = ref.pack(values, w, dt)
        got = from_jax_form(pk.pack(to_jax_form(values, dt), w, dt), dt)
        check(f"pack {dt} W={w}", got, gold)
        out = from_jax_form(pk.unpack(to_jax_form(gold, dt), w, dt), dt)
        check(f"unpack {dt} W={w}", out, values)

    # fused delta + ffor at a mid width
    w = max(2, t // 2 + 1)
    base = np.zeros(nl, layout.np_dtype(dt))
    values = np.sort(rand(dt, w - 1, N), axis=1)
    transposed = ref.transpose(values, dt)
    deltas = ref.delta(transposed, np.broadcast_to(base, (N, nl)), dt)
    gpacked = ref.pack(deltas, w, dt)
    got = from_jax_form(
        pk.delta_pack(to_jax_form(transposed, dt), to_jax_form(base, dt), w, dt), dt)
    check(f"delta_pack {dt} W={w}", got, gpacked)
    got = from_jax_form(pk.undelta_pack(to_jax_form(gpacked, dt), to_jax_form(base, dt), w, dt), dt)
    check(f"undelta_pack {dt} W={w}", got, transposed)

    # per-block base (the DeltaCodec/FLT form: base[b] = row-0 seeds)
    pb_base = np.ascontiguousarray(transposed[:, :nl])
    pb_deltas = ref.delta(transposed, pb_base, dt)
    pb_w = min(t, int(pb_deltas.max()).bit_length()) or 1
    pb_packed = ref.pack(pb_deltas, pb_w, dt)
    got = from_jax_form(pk.undelta_pack(to_jax_form(pb_packed, dt),
                                        to_jax_form(pb_base, dt), pb_w, dt), dt)
    check(f"undelta_pack per-block-base {dt} W={pb_w}", got, transposed)

    # fused zdelta decode (unzigzag + prefix-sum inside the unpack kernel)
    np_s = np.dtype(f"int{t}")
    np_u = layout.np_dtype(dt)
    sd = pb_deltas.view(np_s)  # two's-complement deltas
    zz = ((sd << 1) ^ (sd >> (t - 1))).view(np_u)  # zigzag codes
    zw = min(t, int(zz.max()).bit_length()) or 1
    zz_packed = ref.pack(zz, zw, dt)
    got = from_jax_form(pk.unzdelta_pack(to_jax_form(zz_packed, dt),
                                         to_jax_form(pb_base, dt), zw, dt), dt)
    check(f"unzdelta_pack {dt} W={zw}", got, transposed)

    refc = (1 << (w - 1)) + 3
    values = rand(dt, w - 1, N) + layout.np_dtype(dt).type(refc)
    gpacked = ref.for_pack(values, refc, w, dt)
    got = from_jax_form(pk.for_pack(to_jax_form(values, dt), refc, w, dt), dt)
    check(f"for_pack {dt} W={w}", got, gpacked)
    got = from_jax_form(pk.unfor_pack(to_jax_form(gpacked, dt), refc, w, dt), dt)
    check(f"unfor_pack {dt} W={w}", got, values)

print("TOTAL FAILS:", len(fails))
for f in fails:
    print("  ", f)
sys.exit(1 if fails else 0)
