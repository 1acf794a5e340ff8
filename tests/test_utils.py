"""utils: serialization round trip, limb views, sha helpers."""

import numpy as np

from fastlanes_tpu.models import BitPackedCodec, FFoRCodec
from fastlanes_tpu.utils import load_encoded, save_encoded
from fastlanes_tpu.utils.testing import (
    GOLDEN_SHA256, from_limb_view, sha256_le, to_limb_view)

from conftest import random_values


def test_limb_views(rng):
    v = random_values(rng, "u64", 64, n_blocks=2)
    limb = to_limb_view(v)
    assert limb.shape == (2, 1024, 2) and limb.dtype == np.uint32
    np.testing.assert_array_equal(from_limb_view(limb), v)
    # little-endian: low limb first
    assert limb[0, 0, 0] == np.uint32(v[0, 0] & 0xFFFFFFFF)


def test_sha256_le():
    vals = (np.arange(1024) % 8).astype(np.uint16)
    from fastlanes_tpu.ref import numpy_ref as ref

    packed = ref.pack(vals, 3, "u16")[0]
    assert sha256_le(packed) == GOLDEN_SHA256["readme_u16_w3"]


def test_save_load_encoded(tmp_path, rng):
    values = random_values(rng, "u32", 9, n_blocks=4)
    enc = BitPackedCodec("u32").encode(values)
    path = str(tmp_path / "enc.npz")
    save_encoded(path, enc)
    enc2 = load_encoded(path)
    assert (enc2.codec, enc2.dtype, enc2.width, enc2.n_blocks) == \
           (enc.codec, enc.dtype, enc.width, enc.n_blocks)
    np.testing.assert_array_equal(enc2.payload, np.asarray(enc.payload))
    out = BitPackedCodec("u32").decode(enc2)
    np.testing.assert_array_equal(np.asarray(out), values)


def test_save_load_ffor_params(tmp_path, rng):
    values = random_values(rng, "u32", 5, n_blocks=2) + np.uint32(777)
    enc = FFoRCodec("u32").encode(values)
    path = str(tmp_path / "ffor.npz")
    save_encoded(path, enc)
    enc2 = load_encoded(path)
    assert enc2.params["reference"] == enc.params["reference"]
    out = FFoRCodec("u32").decode(enc2)
    np.testing.assert_array_equal(np.asarray(out), values)


def test_save_load_alp_encoded(tmp_path, rng):
    """ALP Encoded batches (str/tuple/array params) survive disk."""
    from fastlanes_tpu.models import ALPCodec
    from fastlanes_tpu.utils.serialization import load_encoded, save_encoded

    values = (rng.integers(0, 1 << 16, (3, 1024)) / 100.0).astype(np.float32)
    values[1, 7] = np.float32(1.0) / 3
    enc = ALPCodec("f32").encode(values)
    path = str(tmp_path / "alp.npz")
    save_encoded(path, enc)
    loaded = load_encoded(path)
    assert loaded.params["vtype"] == "f32"
    assert loaded.params["shape"] == (3, 1024)
    out = np.asarray(ALPCodec("f32").decode(loaded))
    np.testing.assert_array_equal(out.view(np.uint32), values.view(np.uint32))
