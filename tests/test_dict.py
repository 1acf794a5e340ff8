"""Dictionary codec: sorted per-chunk dictionary + u16 code stream through
the standard bitpack machinery (FastLanes-family DICT, VLDB'23; beyond the
Rust crate — reference has bitpack/delta/ffor/transpose only,
/root/reference/src/lib.rs)."""

import json

import numpy as np
import pytest

from fastlanes_tpu import cli, fio
from fastlanes_tpu.core import layout


def _categorical(rng, dtype, n_blocks=4, n_cats=7):
    """Low-cardinality, high-alternation data (dict's home turf: rle pays
    per-position runs, bitpack pays the raw magnitude width)."""
    np_dt = layout.np_dtype(dtype)
    hi = (1 << min(30, layout.bit_width(dtype) - 1)) - 1
    cats = rng.choice(hi, size=n_cats, replace=False).astype(np_dt)
    picks = rng.integers(0, n_cats, (n_blocks, layout.BLOCK))
    return cats[picks]


def test_dict_parts_sorted_inverse(rng):
    values = _categorical(rng, "u32")
    dictionary, codes = fio._dict_parts(values)
    assert codes.dtype == np.uint16
    assert np.all(np.diff(dictionary.astype(np.int64)) > 0)  # sorted, unique
    np.testing.assert_array_equal(dictionary[codes.astype(np.int64)], values)


@pytest.mark.parametrize("dt", ["u8", "u16", "u32", "u64"])
def test_dict_chunk_roundtrip(dt, rng):
    values = _categorical(rng, dt)
    meta, payload = fio._encode_chunk(values, dt, "dict")
    assert meta["codec"] == "dict"
    assert meta["width"] == 3  # 7 categories -> 3-bit codes
    out = fio._decode_chunk(meta, payload, values.shape[0], dt)
    np.testing.assert_array_equal(out, values)
    # 7 distinct values pack far below raw for the wide dtypes
    if layout.bit_width(dt) >= 32:
        assert len(payload) < values.nbytes / 4


def test_dict_constant_chunk_w0():
    values = np.full((3, layout.BLOCK), 42, np.uint32)
    meta, payload = fio._encode_chunk(values, "u32", "dict")
    assert meta["width"] == 0 and meta["n_dict"] == 1
    assert len(payload) == 4  # the dictionary alone; W=0 packs to nothing
    out = fio._decode_chunk(meta, payload, 3, "u32")
    np.testing.assert_array_equal(out, values)


def test_dict_cardinality_cap(rng):
    values = np.arange(70 * layout.BLOCK, dtype=np.uint32).reshape(70, -1)
    with pytest.raises(ValueError, match="distinct values exceed"):
        fio._encode_chunk(values, "u32", "dict")


def test_dict_file_roundtrip_auto_and_single(tmp_path, rng):
    path = str(tmp_path / "d.flt")
    values = _categorical(rng, "u32", n_blocks=8).reshape(-1)[:7500]
    fio.write_file(path, values, codec="dict")
    np.testing.assert_array_equal(fio.read_file(path), values)
    # auto picks dict: 7 huge random categories alternating every position
    # (delta/zdelta wide, rle run-per-position, bitpack ~30 bits)
    header = fio.write_file(path, values, codec="auto")
    assert {c["codec"] for c in header["chunks"]} == {"dict"}
    np.testing.assert_array_equal(fio.read_file(path), values)
    # random access touches one code row + one dictionary entry
    assert fio.read_single(path, 2, 123) == values[2 * 1024 + 123]
    assert fio.read_single(path, 0, 0) == values[0]


def test_dict_signed_column(tmp_path, rng):
    path = str(tmp_path / "ds.flt")
    cats = np.array([-1000000, -3, 0, 7, 123456], np.int32)
    values = cats[rng.integers(0, len(cats), 5000)]
    fio.write_file(path, values, codec="dict")
    got = fio.read_file(path)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, values)
    got1 = fio.read_single(path, 1, 10)
    assert got1 == values[1024 + 10]


def test_dict_device_read_batched(tmp_path, rng):
    from fastlanes_tpu import fio_device, parallel

    path = str(tmp_path / "d.flt")
    values = _categorical(rng, "u32", n_blocks=16)
    # chunk_blocks=4 -> 4 dict chunks; same code width batches them into
    # ONE unpack dispatch + ONE gather over the concatenated dictionary
    fio.write_file(path, values, codec="dict", chunk_blocks=4)
    header = fio.read_header(path)
    assert len(header["chunks"]) == 4
    got = np.asarray(fio_device.read_file_device(path))
    np.testing.assert_array_equal(got, values)
    mesh = parallel.make_mesh()
    got = np.asarray(fio_device.read_file_device(path, mesh=mesh))
    np.testing.assert_array_equal(got, values)


def test_dict_device_read_u64(tmp_path, rng):
    from fastlanes_tpu import fio_device

    path = str(tmp_path / "d64.flt")
    cats = (np.array([1, 2, 5], np.uint64) << np.uint64(40)) + np.uint64(9)
    values = cats[rng.integers(0, 3, (4, layout.BLOCK))]
    fio.write_file(path, values, codec="dict")
    got = np.asarray(fio_device.read_file_device(path))
    want = np.ascontiguousarray(values).view(np.uint32).reshape(4, 1024, 2)
    np.testing.assert_array_equal(got, want)


def test_dict_block_range_read(tmp_path, rng):
    path = str(tmp_path / "d.flt")
    values = _categorical(rng, "u16", n_blocks=12)
    fio.write_file(path, values, codec="dict", chunk_blocks=4)
    np.testing.assert_array_equal(fio.read_blocks(path, 3, 9), values[3:9])


def test_dict_corruption_rejected(tmp_path, rng):
    values = _categorical(rng, "u32", n_blocks=2)
    meta, payload = fio._encode_chunk(values, "u32", "dict")
    # truncated dictionary
    with pytest.raises(ValueError, match="truncated dict chunk"):
        fio._decode_chunk(meta, payload[:3], 2, "u32")
    # short code stream
    nd_bytes = meta["n_dict"] * 4
    with pytest.raises(ValueError, match="short code stream"):
        fio._decode_chunk(meta, payload[: nd_bytes + 8], 2, "u32")
    # code beyond dictionary: shrink n_dict so valid codes overflow it
    bad = dict(meta, n_dict=2)
    trimmed = payload[(meta["n_dict"] - 2) * 4:]
    with pytest.raises(ValueError, match="beyond dictionary"):
        fio._decode_chunk(bad, trimmed, 2, "u32")


def test_dict_codec_driver_and_auto(rng):
    from fastlanes_tpu.models import codecs

    values = _categorical(rng, "u32", n_blocks=4)
    c = codecs.get_codec("dict", "u32")
    enc = c.encode(values)
    assert enc.codec == "dict" and enc.width == 3
    np.testing.assert_array_equal(np.asarray(c.decode(enc)), values)
    # auto cost model knows dict and picks it here
    costs = codecs.auto_costs(values, "u32")
    assert costs["dict"] == min(costs.values())
    enc = codecs.auto_encode(values, "u32")
    assert enc.codec == "dict"
    np.testing.assert_array_equal(
        np.asarray(codecs.get_codec("dict", "u32").decode(enc)), values)


def test_dict_codec_driver_u64(rng):
    from fastlanes_tpu.models import codecs

    cats = (np.array([3, 8, 21, 55], np.uint64) << np.uint64(45)) | np.uint64(6)
    values = cats[rng.integers(0, 4, (3, layout.BLOCK))]
    c = codecs.get_codec("dict", "u64")
    enc = c.encode(values)
    got = np.asarray(c.decode(enc))  # (..., 2) uint32 limb image
    want = np.ascontiguousarray(values).view(np.uint32).reshape(3, 1024, 2)
    np.testing.assert_array_equal(got, want)
    # the u64 auto probe counts distinct (lo, hi) pairs with a two-key sort
    # (device APIs take the uint32 limb image — x64-free)
    costs = codecs.auto_costs(want, "u64")
    assert costs["dict"] == min(costs.values())
    enc = codecs.auto_encode(want, "u64")
    assert enc.codec == "dict"
    np.testing.assert_array_equal(
        np.asarray(codecs.get_codec("dict", "u64").decode(enc)), want)


def test_cli_dict(tmp_path, rng, capsys):
    raw, flt, out = tmp_path / "d.npy", tmp_path / "d.flt", tmp_path / "o.npy"
    values = _categorical(rng, "u32", n_blocks=4)
    np.save(raw, values)
    assert cli.main(["compress", str(raw), str(flt), "--codec", "dict"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert all(c["codec"] == "dict" for c in info["chunks"])
    assert info["ratio"] > 4.0
    assert cli.main(["decompress", str(flt), str(out)]) == 0
    np.testing.assert_array_equal(np.load(out), values)
