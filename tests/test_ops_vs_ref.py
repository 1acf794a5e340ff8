"""jnp ops conformance vs the NumPy oracle: full width sweep for pack/unpack,
sampled widths for delta/FFoR/single/transpose, u64 limb handling."""

import numpy as np
import pytest

from fastlanes_tpu.core import layout
from fastlanes_tpu.ops import (
    bitpack, delta as delta_mod, dispatch, ffor, single, transpose as tr)
from fastlanes_tpu.ref import numpy_ref as ref

from conftest import random_values, width_sample, width_sweep


def to_jax_form(np_arr, dtype):
    """numpy array (native dtype) -> the form the jnp ops take: native for
    u8/16/32, little-endian u32 limb pairs for u64 (byte-identical image)."""
    if layout.canon_dtype(dtype) == "u64":
        return np.ascontiguousarray(np_arr).view("<u4").reshape(*np_arr.shape, 2)
    return np_arr


def from_jax_form(arr, dtype):
    out = np.asarray(arr)
    if layout.canon_dtype(dtype) == "u64":
        return np.ascontiguousarray(out).view("<u8").reshape(out.shape[:-1])
    return out


@pytest.mark.parametrize("dt,w", width_sweep())
def test_pack_unpack_sweep(dt, w, rng):
    values = random_values(rng, dt, w, n_blocks=2)
    gold_packed = ref.pack(values, w, dt)

    # jitted via the dispatch cache (compiled once per (op, dtype, W))
    packed = from_jax_form(dispatch.get("pack", dt, w)(to_jax_form(values, dt)), dt)
    np.testing.assert_array_equal(packed, gold_packed)

    out = from_jax_form(dispatch.get("unpack", dt, w)(to_jax_form(gold_packed, dt)), dt)
    np.testing.assert_array_equal(out, values)


@pytest.mark.parametrize("dt,w", width_sample())
def test_unbatched_shapes(dt, w, rng):
    values = random_values(rng, dt, w, n_blocks=1)[0]
    packed = from_jax_form(bitpack.pack(to_jax_form(values, dt), w, dt), dt)
    np.testing.assert_array_equal(packed, ref.pack(values, w, dt)[0])
    out = from_jax_form(bitpack.unpack(to_jax_form(packed, dt), w, dt), dt)
    np.testing.assert_array_equal(out, values)


@pytest.mark.parametrize("dt,w", width_sample())
def test_unpack_single(dt, w, rng):
    values = random_values(rng, dt, w, n_blocks=2)
    packed = ref.pack(values, w, dt)
    idx = np.array([0, 1, 17, 100, 511, 767, 1023])
    got = from_jax_form(single.unpack_single(to_jax_form(packed, dt), w, idx, dt), dt)
    np.testing.assert_array_equal(got, values[:, idx])
    # scalar index
    got1 = from_jax_form(single.unpack_single(to_jax_form(packed, dt), w, 14, dt), dt)
    np.testing.assert_array_equal(got1, values[:, 14])


@pytest.mark.parametrize("dt,w", width_sample())
def test_delta_fused_and_unfused(dt, w, rng):
    t = layout.bit_width(dt)
    nl = layout.lanes(dt)
    # sorted-ish data so deltas fit small widths; any data works at full width
    values = np.sort(random_values(rng, dt, t, n_blocks=2), axis=1)
    base = np.zeros((2, nl), layout.np_dtype(dt))
    transposed = ref.transpose(values, dt)
    deltas = ref.delta(transposed, base, dt)

    got_delta = from_jax_form(
        delta_mod.delta(to_jax_form(transposed, dt), to_jax_form(base, dt), dt), dt)
    np.testing.assert_array_equal(got_delta, deltas)

    got_undelta = from_jax_form(
        delta_mod.undelta(to_jax_form(deltas, dt), to_jax_form(base, dt), dt), dt)
    np.testing.assert_array_equal(got_undelta, transposed)

    # fused paths at full width (exact regardless of delta magnitudes)
    packed = ref.pack(deltas, t, dt)
    got_fused = from_jax_form(
        delta_mod.undelta_pack(to_jax_form(packed, dt), to_jax_form(base, dt), t, dt), dt)
    np.testing.assert_array_equal(got_fused, transposed)

    got_dp = from_jax_form(
        delta_mod.delta_pack(to_jax_form(transposed, dt), to_jax_form(base, dt), t, dt), dt)
    np.testing.assert_array_equal(got_dp, packed)

    # fused at the sampled width w, vs oracle on matching data
    packed_w = ref.pack(deltas, w, dt)
    gold_w = ref.undelta_pack(packed_w, base, w, dt)
    got_w = from_jax_form(
        delta_mod.undelta_pack(to_jax_form(packed_w, dt), to_jax_form(base, dt), w, dt), dt)
    np.testing.assert_array_equal(got_w, gold_w)


@pytest.mark.parametrize("dt,w", width_sample())
def test_ffor(dt, w, rng):
    values = random_values(rng, dt, layout.bit_width(dt), n_blocks=2)
    reference = int(rng.integers(0, 1 << min(layout.bit_width(dt) - 1, 63)))
    gold = ref.for_pack(values, reference, w, dt)
    got = from_jax_form(ffor.for_pack(to_jax_form(values, dt), reference, w, dt), dt)
    np.testing.assert_array_equal(got, gold)

    gold_un = ref.unfor_pack(gold, reference, w, dt)
    got_un = from_jax_form(ffor.unfor_pack(to_jax_form(gold, dt), reference, w, dt), dt)
    np.testing.assert_array_equal(got_un, gold_un)


@pytest.mark.parametrize("dt", layout.DTYPES)
def test_transpose(dt, rng):
    values = random_values(rng, dt, layout.bit_width(dt), n_blocks=3)
    got_t = from_jax_form(tr.transpose(to_jax_form(values, dt), dt), dt)
    np.testing.assert_array_equal(got_t, ref.transpose(values, dt))
    got_u = from_jax_form(tr.untranspose(to_jax_form(got_t, dt), dt), dt)
    np.testing.assert_array_equal(got_u, values)


def test_runtime_width_dispatch(rng):
    """unchecked_* mirror reference bitpacking.rs:82-128: width picked at runtime."""
    for w in (0, 3, 10, 32):
        values = random_values(rng, "u32", w, n_blocks=2)
        packed = np.asarray(dispatch.unchecked_pack(w, values, "u32"))
        np.testing.assert_array_equal(packed, ref.pack(values, w, "u32"))
        out = np.asarray(dispatch.unchecked_unpack(w, packed, "u32"))
        np.testing.assert_array_equal(out, values)
        got = np.asarray(dispatch.unchecked_unpack_single(w, packed, np.arange(16), "u32"))
        np.testing.assert_array_equal(got, values[:, :16])
    # dispatch cache returns identical compiled fn objects
    assert dispatch.get("pack", "u32", 7) is dispatch.get("pack", "uint32", 7)
    with pytest.raises(ValueError):
        dispatch.get("pack", "u32", 33)
    with pytest.raises(ValueError):
        dispatch.get("nope", "u32", 3)


def test_ops_compose_under_jit(rng):
    """ops are pure jnp -> they compose inside a user's jit."""
    import jax
    import jax.numpy as jnp

    w = 11

    @jax.jit
    def roundtrip(v):
        p = bitpack.pack(v, w, "u32")
        return bitpack.unpack(p, w, "u32")

    values = random_values(rng, "u32", w, n_blocks=4)
    np.testing.assert_array_equal(np.asarray(roundtrip(jnp.asarray(values))), values)


def test_u64_native_x64(rng):
    """u64 arrays directly (jax x64 enabled) match the limb path."""
    import jax

    with jax.enable_x64(True):
        values = random_values(rng, "u64", 40, n_blocks=2)
        import jax.numpy as jnp

        jv = jnp.asarray(values)
        assert str(jv.dtype) == "uint64"
        packed = np.asarray(bitpack.pack(jv, 40, "u64"))
        np.testing.assert_array_equal(packed, ref.pack(values, 40, "u64"))


def test_unpack_planes_u64(rng):
    """u64 plane-output decode (the performance form): planes restack to
    the byte-exact limb image; non-limb dtypes are rejected."""
    import pytest as _pytest

    from fastlanes_tpu.ops import bitpack as _bp

    v = random_values(rng, "u64", 17, n_blocks=3)
    p = ref.pack(v, 17, "u64")
    pimg = np.ascontiguousarray(p).view(np.uint32).reshape(3, -1, 2)
    lo, hi = _bp.unpack_planes(pimg, 17, "u64")
    img = np.stack([np.asarray(lo), np.asarray(hi)], axis=-1)
    want = np.ascontiguousarray(v).view(np.uint32).reshape(3, 1024, 2)
    np.testing.assert_array_equal(img, want)
    lo1, _hi1 = _bp.unpack_planes(pimg[0], 17, "u64")
    np.testing.assert_array_equal(np.asarray(lo1), want[0, :, 0])
    with _pytest.raises(ValueError, match="limb"):
        _bp.unpack_planes(np.zeros((2, 96), np.uint32), 3, "u32")


@pytest.mark.parametrize("dt", ["u8", "u16"])
def test_swar_conformance_sweep(dt, rng):
    """The SWAR-domain u8/u16 codecs (documented negative-result
    experiment, ops/swar.py) stay bit-exact across the full width sweep."""
    from fastlanes_tpu.ops import swar

    t = layout.bit_width(dt)
    for w in range(1, t + 1):
        vals = random_values(rng, dt, w, n_blocks=2)
        gold = ref.pack(vals, w, dt)
        np.testing.assert_array_equal(np.asarray(swar.pack(vals, w, dt)), gold)
        np.testing.assert_array_equal(np.asarray(swar.unpack(gold, w, dt)), vals)
    # W=0 and unbatched forms
    assert swar.pack(vals[0], 0, dt).shape == (0,)
    np.testing.assert_array_equal(
        np.asarray(swar.unpack(np.zeros(0, layout.np_dtype(dt)), 0, dt)),
        np.zeros(1024, layout.np_dtype(dt)))
