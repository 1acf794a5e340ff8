"""Arbitrary-length (non-multiple-of-1024) column support in FLT."""

import json

import numpy as np
import pytest

from fastlanes_tpu import cli, fio, fio_device


@pytest.mark.parametrize("n", [1, 1000, 1024, 1025, 5000])
def test_flat_column_roundtrip(tmp_path, rng, n):
    col = np.sort(rng.integers(0, 1 << 20, n, np.int64).astype(np.uint32))
    path = str(tmp_path / "c.flt")
    header = fio.write_file(path, col, dtype="u32")
    got = fio.read_file(path)
    np.testing.assert_array_equal(got, col)
    assert header["n_values"] == n  # flat inputs always round-trip flat


def test_flat_column_device_decode(tmp_path, rng):
    col = np.sort(rng.integers(0, 1 << 18, 3000, np.int64).astype(np.uint32))
    path = str(tmp_path / "c.flt")
    fio.write_file(path, col, dtype="u32")
    got = np.asarray(fio_device.read_file_device(path))
    np.testing.assert_array_equal(got, col)


def test_flat_u64_device_decode(tmp_path, rng):
    col = np.sort(rng.integers(0, 1 << 40, 1500, np.int64).astype(np.uint64))
    path = str(tmp_path / "c.flt")
    fio.write_file(path, col, dtype="u64")
    got = np.asarray(fio_device.read_file_device(path))  # (n, 2) limb image
    got = (np.ascontiguousarray(got).view(np.uint8).reshape(got.shape[0], -1)
           .view(np.uint64).reshape(-1))
    np.testing.assert_array_equal(got, col)


def test_cli_ragged_roundtrip(tmp_path, rng, capsys):
    col = rng.integers(0, 1 << 12, 2500, np.int64).astype(np.uint16)
    raw, flt, out = tmp_path / "r.npy", tmp_path / "r.flt", tmp_path / "o.npy"
    np.save(raw, col)
    assert cli.main(["compress", str(raw), str(flt)]) == 0
    capsys.readouterr()
    assert cli.main(["decompress", str(flt), str(out)]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["shape"] == [2500]
    np.testing.assert_array_equal(np.load(out), col)


def test_padding_does_not_hurt_width(tmp_path, rng):
    """Tail padding repeats the last value -> zero extra delta width."""
    col = np.sort(rng.integers(0, 1 << 20, 1100, np.int64).astype(np.uint32))
    path = str(tmp_path / "c.flt")
    header = fio.write_file(path, col, dtype="u32", codec="delta")
    full = fio.write_file(str(tmp_path / "f.flt"),
                          np.sort(rng.integers(0, 1 << 20, 1024, np.int64)
                                  .astype(np.uint32)), codec="delta")
    assert header["chunks"][0]["width"] <= full["chunks"][0]["width"] + 2
