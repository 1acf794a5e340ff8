"""C++ host codec conformance vs the NumPy oracle (independent implementations
must agree bit-for-bit across the full sweep)."""

import numpy as np
import pytest

from fastlanes_tpu import native
from fastlanes_tpu.core import layout
from fastlanes_tpu.ref import numpy_ref as ref

from conftest import random_values, width_sample, width_sweep

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build failed")


@pytest.mark.parametrize("dt,w", width_sweep())
def test_native_pack_unpack_sweep(dt, w, rng):
    values = random_values(rng, dt, w, n_blocks=3)
    gold = ref.pack(values, w, dt)
    got = native.pack(values, w, dt)
    np.testing.assert_array_equal(got, gold)
    out = native.unpack(gold, w, dt)
    np.testing.assert_array_equal(out, values)


@pytest.mark.parametrize("dt,w", width_sample())
def test_native_unpack_single(dt, w, rng):
    values = random_values(rng, dt, w, n_blocks=2)
    packed = native.pack(values, w, dt)
    idx = np.array([0, 5, 99, 1023])
    got = native.unpack_single(packed, w, idx, dt)
    np.testing.assert_array_equal(got, values[:, idx])


@pytest.mark.parametrize("dt", layout.DTYPES)
def test_native_delta_and_fused(dt, rng):
    t = layout.bit_width(dt)
    nl = layout.lanes(dt)
    values = np.sort(random_values(rng, dt, t, n_blocks=2), axis=1)
    base = random_values(rng, dt, t, n_blocks=2)[:, :nl]
    transposed = ref.transpose(values, dt)

    got_t = native.transpose(values, dt)
    np.testing.assert_array_equal(got_t, transposed)
    np.testing.assert_array_equal(native.untranspose(got_t, dt), values)

    deltas = native.delta(transposed, base, dt)
    np.testing.assert_array_equal(deltas, ref.delta(transposed, base, dt))
    np.testing.assert_array_equal(native.undelta(deltas, base, dt), transposed)

    for w in (t // 2, t):
        gold_packed = ref.pack(ref.delta(transposed, base, dt), w, dt)
        got_packed = native.delta_pack(transposed, base, w, dt)
        np.testing.assert_array_equal(got_packed, gold_packed)
        gold_dec = ref.undelta_pack(gold_packed, base, w, dt)
        np.testing.assert_array_equal(native.undelta_pack(got_packed, base, w, dt), gold_dec)


@pytest.mark.parametrize("dt", layout.DTYPES)
def test_native_ffor(dt, rng):
    t = layout.bit_width(dt)
    w = max(1, t // 2)
    values = random_values(rng, dt, t, n_blocks=2)
    reference = int(rng.integers(0, 1 << min(t - 1, 63)))
    gold = ref.for_pack(values, reference, w, dt)
    np.testing.assert_array_equal(native.for_pack(values, reference, w, dt), gold)
    np.testing.assert_array_equal(native.unfor_pack(gold, reference, w, dt),
                                  ref.unfor_pack(gold, reference, w, dt))


def test_native_golden_readme():
    values = (np.arange(1024) % 8).astype(np.uint16)[None]
    packed = native.pack(values, 3, "u16")
    import hashlib

    digest = hashlib.sha256(packed[0].astype("<u2").tobytes()).hexdigest()
    assert digest == "f949547d2b920f409dc21441e8ce7d412965a9ff3eac94d551362f689372db20"


def test_native_bad_width():
    with pytest.raises(ValueError):
        native.pack(np.zeros((1, 1024), np.uint8), 9, "u8")


def test_native_out_buffers(rng):
    """Preallocated out= buffers (IO pipelines reuse them; a fresh np.empty
    per call page-faults its extent) round-trip bit-exact and validate."""
    from fastlanes_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")
    vals = rng.integers(0, 8, (16, 1024), np.int64).astype(np.uint32)
    pbuf = np.empty((16, layout.packed_len("u32", 3)), np.uint32)
    obuf = np.empty((16, 1024), np.uint32)
    p = native.pack(vals, 3, "u32", out=pbuf)
    assert p is pbuf
    o = native.unpack(pbuf, 3, "u32", out=obuf)
    assert o is obuf
    np.testing.assert_array_equal(obuf, vals)
    with pytest.raises(ValueError, match="C-contiguous"):
        native.unpack(pbuf, 3, "u32", out=np.empty((16, 1024), np.uint16))
