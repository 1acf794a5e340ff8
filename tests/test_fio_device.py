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


def test_read_files_device_cross_file_batching(tmp_path, rng, monkeypatch):
    """read_files_device: same-signature chunks across MANY files decode in
    one dispatch; mixed dtypes/codecs/transforms still come back per-file
    correct (vs the host reader)."""
    # three same-signature u32 files (sorted -> delta at one width), plus a
    # u16 bitpack file, a signed (zigzag) file, and a ragged flat column
    paths, want = [], {}
    base = rng.integers(1000, 1 << 20, (3, 8 * 1024), np.int64)
    for i in range(3):
        vals = np.sort(base[i].astype(np.uint32)).reshape(8, 1024)
        p = str(tmp_path / f"s{i}.flt")
        fio.write_file(p, vals, codec="delta", chunk_blocks=4)
        paths.append(p)
        want[p] = vals
    p16 = str(tmp_path / "w.flt")
    v16 = rng.integers(0, 1 << 9, (6, 1024), np.int64).astype(np.uint16)
    fio.write_file(p16, v16, codec="bitpack", chunk_blocks=2)
    paths.append(p16)
    want[p16] = v16
    psg = str(tmp_path / "sg.flt")
    vsg = rng.integers(-4000, 4000, 5000, np.int64).astype(np.int32)
    fio.write_file(psg, vsg)
    paths.append(psg)
    want[psg] = vsg

    calls = {"runs": [], "singles": 0}
    real_run = fio_device._decode_run_batched
    real_one = fio_device._decode_chunk_device
    monkeypatch.setattr(fio_device, "_decode_run_batched",
                        lambda sig, run, *a, **k: (calls["runs"].append(len(run)),
                                                   real_run(sig, run, *a, **k))[1])
    monkeypatch.setattr(fio_device, "_decode_chunk_device",
                        lambda *a, **k: (calls.__setitem__("singles", calls["singles"] + 1),
                                         real_one(*a, **k))[1])
    out = fio_device.read_files_device(paths)
    for p in paths:
        got = np.asarray(out[p])
        np.testing.assert_array_equal(got, np.asarray(want[p]),
                                      err_msg=p)
        np.testing.assert_array_equal(got, np.asarray(fio.read_file(p)),
                                      err_msg=p)
    # cross-file batching: some dispatch covered chunks from MORE than one
    # file (each file has only 2 chunks; the three delta files share width
    # 11 on 5 of their 6 chunks — the sixth lands at width 10 and decodes
    # alone)
    assert any(r > 2 for r in calls["runs"]), calls


def test_read_files_device_mixed_u64_float(tmp_path, rng):
    """u64 integer (LimbPlanes), f32 ALP and f64 ALP_RD files through the
    multi-file reader, sharded and unsharded."""
    pu = str(tmp_path / "u.flt")
    vu = rng.integers(0, 1 << 40, (4, 1024), np.int64).astype(np.uint64)
    fio.write_file(pu, vu, codec="bitpack")
    pf = str(tmp_path / "f.flt")
    vf = ((rng.integers(0, 1 << 16, 3000)) / 100.0).astype(np.float32)
    fio.write_file(pf, vf, codec="alp")
    pd = str(tmp_path / "d.flt")
    vd = (rng.standard_normal(2100) * 13).astype(np.float64)
    fio.write_file(pd, vd, codec="alprd")
    for mesh in (None, pmesh.make_mesh(8)):
        out = fio_device.read_files_device([pu, pf, pd], mesh=mesh)
        got_u = np.asarray(out[pu])
        assert got_u.dtype == np.uint32 and got_u.shape[-1] == 2
        np.testing.assert_array_equal(
            np.ascontiguousarray(got_u).view(np.uint64)[..., 0], vu)
        np.testing.assert_array_equal(np.asarray(out[pf]).view(np.uint32),
                                      vf.view(np.uint32))
        got_d = np.asarray(out[pd])
        np.testing.assert_array_equal(
            np.ascontiguousarray(got_d).view(np.float64)[..., 0], vd)
