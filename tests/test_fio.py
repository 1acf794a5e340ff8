"""FLT file format: chunked write/read, block-range random access,
single-element random access, all codecs, both backends."""

import numpy as np
import pytest

from fastlanes_tpu import fio
from fastlanes_tpu.core import layout

from conftest import random_values


@pytest.mark.parametrize("dt", layout.DTYPES)
@pytest.mark.parametrize("codec", ["bitpack", "ffor", "delta", "auto"])
def test_file_roundtrip(tmp_path, dt, codec, rng):
    values = np.sort(random_values(rng, dt, layout.bit_width(dt) // 2, n_blocks=10), axis=1)
    path = str(tmp_path / f"{dt}_{codec}.flt")
    header = fio.write_file(path, values, dtype=dt, codec=codec, chunk_blocks=4)
    assert header["n_blocks"] == 10
    assert len(header["chunks"]) == 3  # 4+4+2
    out = fio.read_file(path)
    np.testing.assert_array_equal(out, values)


def test_block_range_reads(tmp_path, rng):
    values = random_values(rng, "u32", 12, n_blocks=20)
    path = str(tmp_path / "range.flt")
    fio.write_file(path, values, codec="bitpack", chunk_blocks=8)
    np.testing.assert_array_equal(fio.read_blocks(path, 3, 5), values[3:5])
    np.testing.assert_array_equal(fio.read_blocks(path, 7, 17), values[7:17])
    np.testing.assert_array_equal(fio.read_blocks(path, 19), values[19:])
    assert fio.read_blocks(path, 5, 5).shape == (0, 1024)


@pytest.mark.parametrize("codec", ["bitpack", "ffor", "delta"])
def test_single_element(tmp_path, codec, rng):
    values = np.sort(random_values(rng, "u32", 20, n_blocks=6), axis=1) + np.uint32(50)
    path = str(tmp_path / f"single_{codec}.flt")
    fio.write_file(path, values, codec=codec, chunk_blocks=4)
    for blk, idx in [(0, 0), (1, 17), (3, 1023), (5, 512)]:
        assert fio.read_single(path, blk, idx) == values[blk, idx]
    with pytest.raises(IndexError):
        fio.read_single(path, 6, 0)


def test_auto_codec_selection(tmp_path, rng):
    # big offset, tiny spread -> ffor wins
    values = random_values(rng, "u32", 4, n_blocks=4) + np.uint32(1 << 29)
    path = str(tmp_path / "auto.flt")
    header = fio.write_file(path, values, codec="auto")
    assert header["chunks"][0]["codec"] == "ffor"
    assert header["chunks"][0]["width"] <= 5
    np.testing.assert_array_equal(fio.read_file(path), values)


def test_compression_on_disk(tmp_path, rng):
    import os

    values = random_values(rng, "u32", 3, n_blocks=64)
    path = str(tmp_path / "small.flt")
    fio.write_file(path, values)
    raw_bytes = values.nbytes
    assert os.path.getsize(path) < raw_bytes / 8  # 3 of 32 bits + header

    # corrupt magic
    bad = str(tmp_path / "bad.flt")
    with open(bad, "wb") as f:
        f.write(b"NOTFLT" + b"\x00" * 10)
    with pytest.raises(ValueError):
        fio.read_header(bad)
