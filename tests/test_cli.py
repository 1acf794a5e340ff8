"""CLI round-trip tests (compress / decompress / inspect / get)."""

import json

import numpy as np
import pytest

from fastlanes_tpu import cli
from fastlanes_tpu.core import layout


@pytest.fixture
def column(rng):
    # sorted-ish data so auto picks a non-trivial codec
    return np.sort(rng.integers(0, 1 << 20, (8, layout.BLOCK), np.int64)
                   .astype(np.uint32), axis=1)


def test_cli_roundtrip(tmp_path, column, capsys):
    raw = tmp_path / "col.npy"
    flt = tmp_path / "col.flt"
    out = tmp_path / "out.npy"
    np.save(raw, column)

    assert cli.main(["compress", str(raw), str(flt), "--chunk-blocks", "4"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["n_blocks"] == 8
    assert info["ratio"] > 1.0

    assert cli.main(["decompress", str(flt), str(out)]) == 0
    np.testing.assert_array_equal(np.load(out), column)


def test_cli_block_range_and_get(tmp_path, column, capsys):
    raw = tmp_path / "col.npy"
    flt = tmp_path / "col.flt"
    out = tmp_path / "out.npy"
    np.save(raw, column)
    cli.main(["compress", str(raw), str(flt), "--chunk-blocks", "2"])
    capsys.readouterr()

    cli.main(["decompress", str(flt), str(out), "--start", "3", "--stop", "6"])
    capsys.readouterr()
    np.testing.assert_array_equal(np.load(out), column[3:6])

    cli.main(["get", str(flt), "5", "777"])
    assert int(capsys.readouterr().out.strip()) == int(column[5, 777])


def test_cli_inspect(tmp_path, column, capsys):
    raw = tmp_path / "col.npy"
    flt = tmp_path / "col.flt"
    np.save(raw, column)
    cli.main(["compress", str(raw), str(flt)])
    capsys.readouterr()
    cli.main(["inspect", str(flt)])
    info = json.loads(capsys.readouterr().out)
    assert info["dtype"] == "u32"
    assert info["n_blocks"] == 8


def test_cli_zdelta_codec(tmp_path, rng, capsys):
    # noisy-sorted data: forcing zdelta must round-trip and report zdelta chunks
    vals = (np.sort(rng.integers(0, 1 << 16, (4, layout.BLOCK), np.int64), axis=1)
            + rng.integers(-3, 4, (4, layout.BLOCK))).astype(np.uint32)
    raw, flt, out = tmp_path / "z.npy", tmp_path / "z.flt", tmp_path / "zo.npy"
    np.save(raw, vals)
    assert cli.main(["compress", str(raw), str(flt), "--codec", "zdelta"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert all(c["codec"] == "zdelta" for c in info["chunks"])
    assert cli.main(["decompress", str(flt), str(out)]) == 0
    np.testing.assert_array_equal(np.load(out), vals)


def test_cli_device_decompress(tmp_path, column, capsys):
    raw, flt = tmp_path / "col.npy", tmp_path / "col.flt"
    out = tmp_path / "dev.npy"
    np.save(raw, column)
    cli.main(["compress", str(raw), str(flt), "--chunk-blocks", "4"])
    capsys.readouterr()
    assert cli.main(["decompress", str(flt), str(out), "--device"]) == 0
    np.testing.assert_array_equal(np.load(out), column)
    # block range on device
    assert cli.main(["decompress", str(flt), str(out), "--device",
                     "--start", "2", "--stop", "5"]) == 0
    np.testing.assert_array_equal(np.load(out), column[2:5])


def test_cli_device_decompress_signed_and_u64(tmp_path, rng, capsys):
    # signed i32 (zigzag/viewu transform) and u64 (limb image rejoin)
    svals = rng.integers(-500, 500, 2000, np.int64).astype(np.int32)
    raw, flt, out = tmp_path / "s.npy", tmp_path / "s.flt", tmp_path / "so.npy"
    np.save(raw, svals)
    cli.main(["compress", str(raw), str(flt)])
    capsys.readouterr()
    assert cli.main(["decompress", str(flt), str(out), "--device"]) == 0
    got = np.load(out)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, svals)

    uvals = rng.integers(0, 1 << 40, 2000, np.int64).astype(np.uint64)
    np.save(raw, uvals)
    cli.main(["compress", str(raw), str(flt)])
    capsys.readouterr()
    assert cli.main(["decompress", str(flt), str(out), "--device"]) == 0
    got = np.load(out)
    assert got.dtype == np.uint64
    np.testing.assert_array_equal(got, uvals)


def test_cli_bench_single_block(capsys):
    assert cli.main(["bench", "--dtype", "u16", "--width", "3",
                     "--repeat", "3"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["dtype"] == "u16" and info["width"] == 3
    assert "numpy_oracle" in info
    for key in ("pack_ns", "unpack_ns", "unpack_single_all_ns"):
        assert info["numpy_oracle"][key] > 0


def test_cli_flat_input_and_signed_rejection(tmp_path, rng, capsys):
    flat = rng.integers(0, 100, 2 * layout.BLOCK, np.int64).astype(np.uint16)
    raw = tmp_path / "flat.npy"
    flt = tmp_path / "flat.flt"
    out = tmp_path / "out.npy"
    np.save(raw, flat)
    cli.main(["compress", str(raw), str(flt)])
    capsys.readouterr()
    cli.main(["decompress", str(flt), str(out)])
    np.testing.assert_array_equal(np.load(out), flat)  # flat in -> flat out

    # signed input is zigzag-transformed and round-trips signed
    signed = tmp_path / "signed.npy"
    svals = rng.integers(-500, 500, 2000, np.int64).astype(np.int32)
    np.save(signed, svals)
    assert cli.main(["compress", str(signed), str(flt)]) == 0
    capsys.readouterr()
    assert cli.main(["decompress", str(flt), str(out)]) == 0
    got = np.load(out)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, svals)
    # an explicit --dtype instead reinterprets the bits mod 2^T
    assert cli.main(["compress", str(signed), str(flt), "--dtype", "u32"]) == 0


def test_cli_scan(tmp_path, rng, capsys):
    raw, flt = tmp_path / "s.npy", tmp_path / "s.flt"
    values = rng.integers(0, 10_000, 5000, np.int64).astype(np.uint32)
    np.save(raw, values)
    cli.main(["compress", str(raw), str(flt)])
    capsys.readouterr()
    assert cli.main(["scan", str(flt), "--where", "gt:5000"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["sum"] == int(values.sum())
    assert stats["min"] == int(values.min())
    assert stats["max"] == int(values.max())
    assert stats["count"] == 5000
    assert stats["count_gt_5000"] == int((values > 5000).sum())


def test_cli_scan_table(tmp_path, rng, capsys):
    from fastlanes_tpu import fio_table

    path = tmp_path / "t.flt"
    qty = rng.integers(0, 500, 3000).astype(np.uint16)
    fio_table.write_table(str(path), {"qty": qty})
    assert cli.main(["scan", str(path), "--column", "qty"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["sum"] == int(qty.sum())
    # no --column on a table file -> single-pass scan of every column
    assert cli.main(["scan", str(path)]) == 0
    all_stats = json.loads(capsys.readouterr().out)
    assert all_stats["qty"]["sum"] == int(qty.sum())
    assert all_stats["qty"]["count"] == 3000
    # --where still needs a single column
    with pytest.raises(SystemExit, match="column"):
        cli.main(["scan", str(path), "--where", "gt:10"])


def test_cli_scan_where_stats(tmp_path, rng, capsys):
    """--where emits the filtered aggregation; --where-column crosses
    columns on table files."""
    from fastlanes_tpu import fio_table

    raw, flt = tmp_path / "w.npy", tmp_path / "w.flt"
    values = rng.integers(0, 1000, 4000, np.int64).astype(np.uint32)
    np.save(raw, values)
    cli.main(["compress", str(raw), str(flt)])
    capsys.readouterr()
    assert cli.main(["scan", str(flt), "--where", "ge:500"]) == 0
    stats = json.loads(capsys.readouterr().out)
    m = values >= 500
    assert stats["where"]["sum"] == int(values[m].sum())
    assert stats["where"]["min"] == int(values[m].min())
    assert stats["count_ge_500"] == int(m.sum())
    # cross-column on a table
    tab = tmp_path / "t.flt"
    qty = rng.integers(0, 100, 3000).astype(np.uint16)
    price = rng.integers(0, 10_000, 3000, np.int64).astype(np.uint32)
    fio_table.write_table(str(tab), {"qty": qty, "price": price})
    assert cli.main(["scan", str(tab), "--column", "price",
                     "--where", "gt:50", "--where-column", "qty"]) == 0
    stats = json.loads(capsys.readouterr().out)
    m = qty > 50
    assert stats["where"]["sum"] == int(price[m].sum())
    assert stats["where"]["count"] == int(m.sum())


def test_cli_scan_group_by(tmp_path, rng, capsys):
    from fastlanes_tpu import fio_table

    tab = tmp_path / "g.flt"
    key = rng.integers(0, 4, 3000).astype(np.uint16)
    price = rng.integers(0, 10_000, 3000, np.int64).astype(np.uint32)
    fio_table.write_table(str(tab), {"k": key, "price": price})
    assert cli.main(["scan", str(tab), "--column", "price",
                     "--group-by", "k"]) == 0
    groups = json.loads(capsys.readouterr().out)
    for g in np.unique(key):
        m = key == g
        assert groups[str(g)]["sum"] == int(price[m].sum())
        assert groups[str(g)]["count"] == int(m.sum())
    with pytest.raises(SystemExit, match="table"):
        cli.main(["scan", str(tab), "--group-by", "k"])


def test_cli_recompress(tmp_path, rng, capsys):
    import json

    from fastlanes_tpu import fio_table

    src = str(tmp_path / "a.flt")
    dst = str(tmp_path / "b.flt")
    n = 3000
    qty = rng.integers(0, 9, n).astype(np.uint32)
    cur = np.array(["x", "y"])[rng.integers(0, 2, n)]
    fio_table.write_table(src, {"qty": qty, "cur": cur}, chunk_blocks=1)
    assert cli.main(["recompress", src, dst, "--chunk-blocks", "4"]) == 0
    json.loads(capsys.readouterr().out)
    got = fio_table.read_table(dst)
    np.testing.assert_array_equal(got["qty"], qty)
    np.testing.assert_array_equal(got["cur"], cur)
    assert fio_table.read_table_header(dst)["columns"]["qty"][
        "chunk_blocks"] == 4
    # single-column files too
    from fastlanes_tpu import fio

    s1 = str(tmp_path / "c1.flt")
    s2 = str(tmp_path / "c2.flt")
    vals = np.sort(rng.integers(0, 1 << 20, 4000).astype(np.uint32))
    fio.write_file(s1, vals, codec="bitpack")
    assert cli.main(["recompress", s1, s2]) == 0
    capsys.readouterr()
    np.testing.assert_array_equal(fio.read_file(s2), vals)
    assert {c["codec"] for c in fio.read_header(s2)["chunks"]} <= {
        "delta", "zdelta", "ffor"}
