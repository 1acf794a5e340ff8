"""FLT table container: multi-column files, independent column reads."""

import numpy as np
import pytest

from fastlanes_tpu import fio_table


@pytest.fixture
def table(rng):
    return {
        "ids": np.arange(5000, dtype=np.uint32),                     # ragged, sorted
        "counts": rng.integers(0, 100, 5000, np.int64).astype(np.uint16),
        "flags": rng.integers(0, 2, 5000, np.int64).astype(np.uint8),
        "stamps": np.sort(rng.integers(0, 1 << 40, (4, 1024), np.int64)
                          .astype(np.uint64), axis=1),               # pre-blocked
    }


def test_table_roundtrip(tmp_path, table):
    path = str(tmp_path / "t.flt")
    header = fio_table.write_table(path, table, chunk_blocks=2)
    assert set(header["columns"]) == set(table)
    got = fio_table.read_table(path)
    for name, col in table.items():
        np.testing.assert_array_equal(got[name], col, err_msg=name)


def test_single_column_and_ranges(tmp_path, table):
    path = str(tmp_path / "t.flt")
    fio_table.write_table(path, table, chunk_blocks=2)
    ids = fio_table.read_column(path, "ids")
    np.testing.assert_array_equal(ids, table["ids"])
    # block-range read of the pre-blocked column
    mid = fio_table.read_column(path, "stamps", 1, 3)
    np.testing.assert_array_equal(mid, table["stamps"][1:3])


def test_column_codecs_differ(tmp_path, table):
    path = str(tmp_path / "t.flt")
    header = fio_table.write_table(path, table)
    codecs = {name: {c["codec"] for c in col["chunks"]}
              for name, col in header["columns"].items()}
    assert codecs["ids"] == {"delta"}          # sorted ramp -> delta
    assert "bitpack" in codecs["flags"] or "ffor" in codecs["flags"]


def test_errors(tmp_path, table, rng):
    path = str(tmp_path / "t.flt")
    fio_table.write_table(path, table)
    with pytest.raises(KeyError):
        fio_table.read_column(path, "nope")
    with pytest.raises(IndexError):
        fio_table.read_column(path, "ids", 5, 2)
    bogus = tmp_path / "x.flt"
    bogus.write_bytes(b"not a table")
    with pytest.raises(ValueError):
        fio_table.read_table_header(str(bogus))


def test_subset_read(tmp_path, table):
    path = str(tmp_path / "t.flt")
    fio_table.write_table(path, table)
    got = fio_table.read_table(path, names=["flags"])
    assert set(got) == {"flags"}
    np.testing.assert_array_equal(got["flags"], table["flags"])


def test_cli_table_roundtrip(tmp_path, table, capsys):
    import json
    from fastlanes_tpu import cli
    npz, flt, out = tmp_path / "t.npz", tmp_path / "t.flt", tmp_path / "o.npz"
    np.savez(npz, a=table["ids"], b=table["counts"])
    assert cli.main(["compress-table", str(npz), str(flt)]) == 0
    assert json.loads(capsys.readouterr().out)["ratio"] > 1.0
    assert cli.main(["inspect", str(flt)]) == 0
    assert json.loads(capsys.readouterr().out)["kind"] == "table"
    assert cli.main(["decompress-table", str(flt), str(out), "--columns", "a"]) == 0
    capsys.readouterr()
    got = np.load(out)
    assert got.files == ["a"]
    np.testing.assert_array_equal(got["a"], table["ids"])


def test_read_column_device(tmp_path, table):
    from fastlanes_tpu import fio_device
    path = str(tmp_path / "t.flt")
    fio_table.write_table(path, table, chunk_blocks=2)
    for name in ("ids", "counts", "flags"):
        got = np.asarray(fio_device.read_column_device(path, name))
        np.testing.assert_array_equal(got, table[name], err_msg=name)
    mid = np.asarray(fio_device.read_column_device(path, "stamps", 1, 3))
    got = np.ascontiguousarray(mid).view(np.uint8).reshape(mid.shape[0], -1).view(np.uint64)
    np.testing.assert_array_equal(got, table["stamps"][1:3])


def test_read_column_device_signed(tmp_path, rng):
    from fastlanes_tpu import fio_device
    col = np.cumsum(rng.integers(-5, 7, 3000, np.int64)).astype(np.int32)
    path = str(tmp_path / "s.flt")
    fio_table.write_table(path, {"walk": col})
    got = np.asarray(fio_device.read_column_device(path, "walk"))
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, col)
