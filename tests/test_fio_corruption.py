"""FLT robustness: corrupted / truncated / alien files fail cleanly."""

import json
import struct

import numpy as np
import pytest

from fastlanes_tpu import fio, fio_table


@pytest.fixture
def flt(tmp_path, rng):
    path = str(tmp_path / "c.flt")
    fio.write_file(path, rng.integers(0, 1 << 12, 3000, np.int64).astype(np.uint32))
    return path


def _patch_header(path, mutate):
    with open(path, "rb") as f:
        data = bytearray(f.read())
    hlen = struct.unpack("<I", data[6:10])[0]
    header = json.loads(data[10:10 + hlen].decode())
    mutate(header)
    new_hdr = json.dumps(header).encode()
    out = bytes(data[:6]) + struct.pack("<I", len(new_hdr)) + new_hdr + bytes(
        data[10 + hlen:])
    with open(path, "wb") as f:
        f.write(out)


def test_bad_magic(flt):
    with open(flt, "r+b") as f:
        f.write(b"NOTFLT")
    with pytest.raises(ValueError, match="not an FLT file"):
        fio.read_file(flt)


def test_future_version(flt):
    _patch_header(flt, lambda h: h.update(version=99))
    with pytest.raises(ValueError, match="unsupported FLT version"):
        fio.read_file(flt)


def test_v1_without_delta_chunks_reads(tmp_path, rng):
    # v1 files are compatible unless they contain delta-family chunks
    # (whose base layout changed in v2) — those get a clear error.
    path = str(tmp_path / "v1.flt")
    vals = rng.integers(0, 1 << 12, 3000, np.int64).astype(np.uint32)
    fio.write_file(path, vals, codec="bitpack")
    _patch_header(path, lambda h: h.update(version=1))
    np.testing.assert_array_equal(fio.read_file(path), vals)


def test_v1_with_delta_chunks_rejected(tmp_path, rng):
    path = str(tmp_path / "v1d.flt")
    vals = np.sort(rng.integers(0, 1 << 12, 3000, np.int64).astype(np.uint32))
    fio.write_file(path, vals, codec="delta")
    _patch_header(path, lambda h: h.update(version=1))
    with pytest.raises(ValueError, match="legacy shared-zero-base"):
        fio.read_file(path)


def test_unknown_codec(flt):
    def mutate(h):
        h["chunks"][0]["codec"] = "zstd"
    _patch_header(flt, mutate)
    with pytest.raises(ValueError, match="unknown codec"):
        fio.read_file(flt)


def test_unknown_transform(flt):
    _patch_header(flt, lambda h: h.update(transform="rot13"))
    with pytest.raises(ValueError, match="unknown transform"):
        fio.read_file(flt)


def test_truncated_payload(flt):
    with open(flt, "rb") as f:
        data = f.read()
    with open(flt, "wb") as f:
        f.write(data[:-64])  # drop the tail of the last chunk
    with pytest.raises(ValueError):
        fio.read_file(flt)  # frombuffer/reshape size mismatch -> ValueError


def test_table_magic_mismatch(tmp_path, rng, flt):
    # single-column file rejected by the table reader and vice versa
    with pytest.raises(ValueError, match="not an FLT table file"):
        fio_table.read_table_header(flt)
    tpath = str(tmp_path / "t.flt")
    fio_table.write_table(tpath, {"a": np.arange(1024, dtype=np.uint16)})
    with pytest.raises(ValueError, match="not an FLT file"):
        fio.read_header(tpath)


def test_truncated_rle_payload(tmp_path, rng):
    path = str(tmp_path / "r.flt")
    vals = np.repeat(rng.integers(0, 100, 60).astype(np.uint32), 50)
    fio.write_file(path, vals, codec="rle")
    with open(path, "rb") as f:
        data = f.read()
    with open(path, "wb") as f:
        f.write(data[:-40])  # drop tail run values
    with pytest.raises(ValueError):
        fio.read_file(path)


def test_alp_bad_meta_rejected(tmp_path, rng):
    path = str(tmp_path / "a.flt")
    vals = (rng.integers(0, 10000, 3000) / 100.0).astype(np.float32)
    fio.write_file(path, vals)
    _patch_header(path, lambda h: h["chunks"][0].update(vtype="f128"))
    with pytest.raises(KeyError):
        fio.read_file(path)
