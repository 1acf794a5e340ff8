"""Zigzag transform + signed-column support in FLT files and tables."""

import numpy as np
import pytest

from fastlanes_tpu import fio, fio_device, fio_table, transforms


@pytest.mark.parametrize("dt", [np.int8, np.int16, np.int32, np.int64])
def test_zigzag_roundtrip_all_widths(rng, dt):
    info = np.iinfo(dt)
    vals = rng.integers(info.min, info.max, 4096, np.int64).astype(dt)
    vals[:4] = [info.min, info.max, 0, -1]
    codes = transforms.zigzag_encode_np(vals)
    assert codes.dtype.kind == "u"
    np.testing.assert_array_equal(transforms.zigzag_decode_np(codes), vals)
    # small magnitudes -> small codes (the point of the transform)
    assert transforms.zigzag_encode_np(np.array([-1], dt))[0] == 1
    assert transforms.zigzag_encode_np(np.array([1], dt))[0] == 2


def test_zigzag_jnp_matches_np(rng):
    vals = rng.integers(-1 << 30, 1 << 30, 2048, np.int64).astype(np.int32)
    import jax.numpy as jnp

    codes = np.asarray(transforms.zigzag_encode(jnp.asarray(vals)))
    np.testing.assert_array_equal(codes, transforms.zigzag_encode_np(vals))
    back = np.asarray(transforms.zigzag_decode(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, vals)


def test_signed_flt_roundtrip_walk(tmp_path, rng):
    # signed random walk: viewu keeps consecutive diffs small -> zdelta wins
    col = np.cumsum(rng.integers(-10, 12, 5000, np.int64)).astype(np.int32)
    path = str(tmp_path / "s.flt")
    header = fio.write_file(path, col)
    assert header["transform"] == "viewu"
    assert header["chunks"][0]["codec"] == "zdelta"
    assert header["chunks"][0]["width"] <= 6  # |delta| <= 11 -> zigzag < 2^5
    got = fio.read_file(path)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, col)
    # random access decodes through the transform too
    assert fio.read_single(path, 2, 100) == col[2 * 1024 + 100]


def test_signed_flt_roundtrip_clustered(tmp_path, rng):
    # unsorted values clustered around zero: zigzag(values) wins
    col = rng.integers(-30, 30, 5000, np.int64).astype(np.int32)
    path = str(tmp_path / "c.flt")
    header = fio.write_file(path, col)
    assert header["transform"] == "zigzag"
    np.testing.assert_array_equal(fio.read_file(path), col)


def test_zdelta_beats_delta_on_noisy_sorted(tmp_path, rng):
    # mostly-ascending unsigned data with occasional small dips: plain delta
    # wraps the negative steps to ~2^32 (width 32); zdelta stays tight
    steps = rng.integers(-3, 20, 5000, np.int64)
    col = (np.cumsum(steps) + 10_000).astype(np.uint32)
    path = str(tmp_path / "n.flt")
    header = fio.write_file(path, col)
    assert header["chunks"][0]["codec"] == "zdelta"
    assert header["chunks"][0]["width"] <= 6
    np.testing.assert_array_equal(fio.read_file(path), col)
    assert fio.read_single(path, 1, 7) == col[1024 + 7]


def test_signed_device_decode(tmp_path, rng):
    col = rng.integers(-1000, 1000, 3000, np.int64).astype(np.int32)
    path = str(tmp_path / "s.flt")
    fio.write_file(path, col)
    got = np.asarray(fio_device.read_file_device(path))
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, col)


def test_signed_table_column(tmp_path, rng):
    table = {
        "balance": rng.integers(-10_000, 10_000, 3000, np.int64).astype(np.int16),
        "id": np.arange(3000, dtype=np.uint32),
    }
    path = str(tmp_path / "t.flt")
    header = fio_table.write_table(path, table)
    assert header["columns"]["balance"]["transform"] == "zigzag"
    got = fio_table.read_table(path)
    assert got["balance"].dtype == np.int16
    for k in table:
        np.testing.assert_array_equal(got[k], table[k])


def test_zdelta_device_decode(tmp_path, rng):
    steps = rng.integers(-3, 20, 4000, np.int64)
    col = (np.cumsum(steps) + 10_000).astype(np.uint32)
    path = str(tmp_path / "n.flt")
    header = fio.write_file(path, col)
    assert header["chunks"][0]["codec"] == "zdelta"
    got = np.asarray(fio_device.read_file_device(path))
    np.testing.assert_array_equal(got, col)


def test_viewu_device_decode(tmp_path, rng):
    col = np.cumsum(rng.integers(-10, 12, 3000, np.int64)).astype(np.int32)
    path = str(tmp_path / "w.flt")
    header = fio.write_file(path, col)
    assert header["transform"] == "viewu"
    got = np.asarray(fio_device.read_file_device(path))
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, col)


def test_u64_zdelta_and_signed_device_decode(tmp_path, rng):
    # u64 noisy-sorted: zdelta on device via limb-domain unzigzag
    steps = rng.integers(-3, 20, 3000, np.int64)
    col = (np.cumsum(steps).astype(np.int64) + (1 << 40)).astype(np.uint64)
    path = str(tmp_path / "u64n.flt")
    header = fio.write_file(path, col)
    assert header["chunks"][0]["codec"] == "zdelta"
    got = np.asarray(fio_device.read_file_device(path))  # (n, 2) limb image
    got = np.ascontiguousarray(got).view(np.uint8).reshape(got.shape[0], -1) \
        .view(np.uint64).reshape(-1)
    np.testing.assert_array_equal(got, col)

    # signed int64 walk: device read returns the limb image of the int64 bits
    scol = np.cumsum(rng.integers(-10, 12, 2000, np.int64))
    spath = str(tmp_path / "i64.flt")
    sheader = fio.write_file(spath, scol)
    assert sheader["transform"] in ("viewu", "zigzag")
    dev = np.asarray(fio_device.read_file_device(spath))
    dev = np.ascontiguousarray(dev).view(np.uint8).reshape(dev.shape[0], -1) \
        .view(np.int64).reshape(-1)
    np.testing.assert_array_equal(dev, scol)
    # host read returns signed directly
    np.testing.assert_array_equal(fio.read_file(spath), scol)
