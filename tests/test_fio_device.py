"""Device-side FLT decode: single-device and 8-device CPU mesh paths."""

import numpy as np
import pytest

from fastlanes_tpu import fio, fio_device
from fastlanes_tpu.core import layout
from fastlanes_tpu.parallel import mesh as pmesh


def _write(tmp_path, values, dtype, codec="auto", chunk_blocks=8):
    path = str(tmp_path / "col.flt")
    fio.write_file(path, values, dtype=dtype, codec=codec, chunk_blocks=chunk_blocks)
    return path


@pytest.mark.parametrize("codec", ["bitpack", "ffor", "delta", "auto"])
def test_device_decode_matches_host(tmp_path, rng, codec):
    values = np.sort(rng.integers(0, 1 << 20, (24, 1024), np.int64)
                     .astype(np.uint32), axis=1)
    path = _write(tmp_path, values, "u32", codec=codec)
    got = np.asarray(fio_device.read_file_device(path))
    np.testing.assert_array_equal(got, values)
    # block range decodes only covering chunks
    got = np.asarray(fio_device.read_blocks_device(path, 5, 19))
    np.testing.assert_array_equal(got, values[5:19])


def test_device_decode_sharded(tmp_path, rng):
    values = np.sort(rng.integers(0, 1 << 28, (32, 1024), np.int64)
                     .astype(np.uint32), axis=1)
    path = _write(tmp_path, values, "u32", codec="auto", chunk_blocks=16)
    mesh = pmesh.make_mesh(8)
    got = np.asarray(fio_device.read_file_device(path, mesh=mesh))
    np.testing.assert_array_equal(got, values)


@pytest.mark.parametrize("dt", ["u8", "u16", "u64"])
def test_device_decode_other_dtypes(tmp_path, rng, dt):
    t = layout.bit_width(dt)
    values = rng.integers(0, 1 << min(t - 1, 40), (8, 1024), np.int64).astype(
        layout.np_dtype(dt))
    path = _write(tmp_path, values, dt)
    got = np.asarray(fio_device.read_file_device(path))
    if dt == "u64":
        got = got.view(np.uint8).reshape(got.shape[0], -1).view(np.uint64)
    np.testing.assert_array_equal(got, values)


def test_device_decode_empty_range(tmp_path, rng):
    values = rng.integers(0, 100, (4, 1024), np.int64).astype(np.uint32)
    path = _write(tmp_path, values, "u32")
    got = np.asarray(fio_device.read_blocks_device(path, 2, 2))
    assert got.shape == (0, 1024)


def test_iter_files_device_pipelined(tmp_path, rng):
    """Pipelined multi-file reader: order-preserving, bit-exact, mixed
    codecs/dtypes/transforms across files."""
    from fastlanes_tpu import fio, fio_device

    paths, want = [], []
    sorted_u32 = np.sort(rng.integers(0, 1 << 20, 3000, np.int64).astype(np.uint32))
    signed = rng.integers(-500, 500, 2500, np.int64).astype(np.int32)
    runs = np.repeat(rng.integers(0, 100, 40).astype(np.uint16), 80)
    prices = (rng.integers(0, 1 << 16, 2000) / 100.0).astype(np.float32)
    for i, vals in enumerate((sorted_u32, signed, runs, prices)):
        p = str(tmp_path / f"c{i}.flt")
        fio.write_file(p, vals)
        paths.append(p)
        want.append(vals)

    got = list(fio_device.iter_files_device(paths, prefetch=2))
    assert [p for p, _ in got] == paths
    for (_, arr), vals in zip(got, want):
        out = np.asarray(arr)
        if vals.dtype == np.float32:
            np.testing.assert_array_equal(out.view(np.uint32),
                                          vals.view(np.uint32))
        else:
            np.testing.assert_array_equal(out, vals)
