"""RLE codec: run-index vector through the standard transposed-Delta
machinery at W=1 (FastLanes VLDB'23 family; beyond the Rust crate)."""

import json

import numpy as np
import pytest

from fastlanes_tpu import cli, fio
from fastlanes_tpu.core import layout


def _runs_data(rng, dtype, n_blocks=4, avg_run=50):
    """Blocks of long runs (sensor-state-like data)."""
    out = np.empty((n_blocks, layout.BLOCK), layout.np_dtype(dtype))
    for b in range(n_blocks):
        pos = 0
        while pos < layout.BLOCK:
            ln = int(rng.integers(1, 2 * avg_run))
            out[b, pos: pos + ln] = layout.np_dtype(dtype).type(
                rng.integers(0, 1 << min(16, layout.bit_width(dtype))))
            pos += ln
    return out


def test_rle_parts_roundtrip(rng):
    values = _runs_data(rng, "u32")
    counts, run_values, idx = fio._rle_parts(values)
    assert idx.dtype == np.uint16
    assert int(counts.sum()) == len(run_values)
    np.testing.assert_array_equal(fio._rle_gather(counts, run_values, idx),
                                  values)


@pytest.mark.parametrize("dt", ["u8", "u16", "u32", "u64"])
def test_rle_chunk_roundtrip(dt, rng):
    values = _runs_data(rng, dt)
    meta, payload = fio._encode_chunk(values, dt, "rle")
    assert meta["codec"] == "rle" and meta["width"] == 1
    out = fio._decode_chunk(meta, payload, values.shape[0], dt)
    np.testing.assert_array_equal(out, values)
    # long runs compress far below raw
    assert len(payload) < values.nbytes / 2


def test_rle_worst_case_all_distinct(rng):
    """No runs at all: still correct (each position its own run)."""
    values = rng.integers(0, 1 << 30, (2, layout.BLOCK), np.int64).astype(np.uint32)
    meta, payload = fio._encode_chunk(values, "u32", "rle")
    assert meta["n_runs"] == values.size
    out = fio._decode_chunk(meta, payload, 2, "u32")
    np.testing.assert_array_equal(out, values)


def test_rle_constant_block():
    values = np.full((3, layout.BLOCK), 7, np.uint16)
    meta, payload = fio._encode_chunk(values, "u16", "rle")
    assert meta["n_runs"] == 3
    out = fio._decode_chunk(meta, payload, 3, "u16")
    np.testing.assert_array_equal(out, values)


def test_rle_file_roundtrip_and_auto(tmp_path, rng):
    path = str(tmp_path / "r.flt")
    values = _runs_data(rng, "u32", n_blocks=8).reshape(-1)[:7500]
    fio.write_file(path, values, codec="rle")
    np.testing.assert_array_equal(fio.read_file(path), values)
    # auto picks rle for run-heavy data (cost model)
    header = fio.write_file(path, values, codec="auto")
    assert {c["codec"] for c in header["chunks"]} == {"rle"}
    np.testing.assert_array_equal(fio.read_file(path), values)
    # random access decodes through the chunk path
    assert fio.read_single(path, 2, 123) == values.reshape(-1)[2 * 1024 + 123]


def test_rle_device_read(tmp_path, rng):
    from fastlanes_tpu import fio_device, parallel

    path = str(tmp_path / "r.flt")
    values = _runs_data(rng, "u32", n_blocks=16)
    fio.write_file(path, values, codec="rle", chunk_blocks=8)
    got = np.asarray(fio_device.read_file_device(path))
    np.testing.assert_array_equal(got, values)
    mesh = parallel.make_mesh()
    got = np.asarray(fio_device.read_file_device(path, mesh=mesh))
    np.testing.assert_array_equal(got, values)


def test_rle_device_read_u64(tmp_path, rng):
    from fastlanes_tpu import fio_device

    path = str(tmp_path / "r64.flt")
    values = _runs_data(rng, "u64", n_blocks=4)
    fio.write_file(path, values, codec="rle")
    got = np.asarray(fio_device.read_file_device(path))
    want = np.ascontiguousarray(values).view(np.uint32).reshape(4, 1024, 2)
    np.testing.assert_array_equal(got, want)


def test_rle_signed_transform(tmp_path, rng):
    path = str(tmp_path / "rs.flt")
    base = rng.integers(-50, 50, 20).astype(np.int32)
    values = np.repeat(base, 200)  # long signed runs
    fio.write_file(path, values, codec="rle")
    got = fio.read_file(path)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, values)


def test_cli_rle(tmp_path, rng, capsys):
    raw, flt, out = tmp_path / "r.npy", tmp_path / "r.flt", tmp_path / "o.npy"
    values = _runs_data(rng, "u32", n_blocks=4)
    np.save(raw, values)
    assert cli.main(["compress", str(raw), str(flt), "--codec", "rle"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert all(c["codec"] == "rle" for c in info["chunks"])
    assert info["ratio"] > 2.0
    assert cli.main(["decompress", str(flt), str(out)]) == 0
    np.testing.assert_array_equal(np.load(out), values)
