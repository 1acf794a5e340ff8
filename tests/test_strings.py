"""String columns: sorted-dictionary encoding over the integer chunk
machinery (codes ride u32 chunks; dictionary blob in the payload area).
Sorted dictionary => code order == lexicographic order, so predicates and
group-bys push down as integer code compares (beyond the integer-only Rust
reference crate, /root/reference/src/lib.rs)."""

import json

import numpy as np
import pytest

from fastlanes_tpu import analytics, cli, fio_table

CATS = np.array(["EUR", "GBP", "JPY", "USD", "chf", "ñu"])


def _tbl(tmp_path, rng, n=5000, with_floats=False):
    path = str(tmp_path / "t.flt")
    cur = CATS[rng.integers(0, len(CATS), n)]
    qty = rng.integers(0, 1000, n).astype(np.uint32)
    cols = {"cur": cur, "qty": qty}
    if with_floats:
        cols["price"] = rng.normal(100.0, 5.0, n).astype(np.float64)
    fio_table.write_table(path, cols)
    return path, cur, qty, cols


def test_string_column_roundtrip(tmp_path, rng):
    path, cur, qty, _ = _tbl(tmp_path, rng)
    got = fio_table.read_column(path, "cur")
    np.testing.assert_array_equal(got, cur)
    # read_table sees both columns
    t = fio_table.read_table(path)
    np.testing.assert_array_equal(t["cur"], cur)
    np.testing.assert_array_equal(t["qty"], qty)


def test_string_column_block_range(tmp_path, rng):
    path, cur, _, _ = _tbl(tmp_path, rng, n=4096)
    got = fio_table.read_column(path, "cur", start=1, stop=3)
    np.testing.assert_array_equal(got.reshape(-1), cur[1024:3072])


def test_string_bytes_and_object_input(tmp_path):
    path = str(tmp_path / "t.flt")
    vals = ["b", "a", "b", "c"] * 300
    fio_table.write_table(path, {
        "obj": np.array(vals, dtype=object),
        "byt": np.array([v.encode() for v in vals]),
    })
    np.testing.assert_array_equal(fio_table.read_column(path, "obj"),
                                  np.array(vals))
    np.testing.assert_array_equal(fio_table.read_column(path, "byt"),
                                  np.array(vals))


def test_string_column_rejects_2d_and_dtype_override(tmp_path, rng):
    with pytest.raises(ValueError, match="must be 1-D"):
        fio_table.write_table(str(tmp_path / "x.flt"),
                              {"s": np.array([["a", "b"]])})
    with pytest.raises(ValueError, match="chooses its own wire dtype"):
        fio_table.write_table(str(tmp_path / "x.flt"),
                              {"s": np.array(["a", "b"] * 600)},
                              dtypes={"s": "u16"})


def test_string_device_read(tmp_path, rng):
    from fastlanes_tpu import fio_device

    path, cur, _, _ = _tbl(tmp_path, rng)
    col = fio_device.read_column_device(path, "cur")
    assert isinstance(col, fio_table.StringColumn)
    assert col.n_dict == len(CATS)
    np.testing.assert_array_equal(col.materialize(), cur)
    assert col.code_of("USD") == int(np.searchsorted(np.sort(CATS), "USD"))
    assert col.code_of("XXX") == -1


def test_string_scan_column_and_table(tmp_path, rng):
    path, cur, qty, _ = _tbl(tmp_path, rng)
    stats = analytics.scan_column(path, column="cur")
    assert stats["sum"] is None
    assert stats["count"] == len(cur)
    assert stats["min"] == min(cur.tolist())
    assert stats["max"] == max(cur.tolist())
    assert stats["n_dict"] == len(CATS)
    st = analytics.scan_table(path)
    assert st["cur"]["min"] == min(cur.tolist())
    assert st["qty"]["sum"] == int(qty.sum())


@pytest.mark.parametrize("op,npop", [
    ("eq", np.equal), ("ne", np.not_equal), ("lt", np.less),
    ("le", np.less_equal), ("gt", np.greater), ("ge", np.greater_equal)])
def test_string_count_where(tmp_path, rng, op, npop):
    path, cur, _, _ = _tbl(tmp_path, rng)
    for probe in ("JPY", "USD", "AAA", "ZZZ", "F"):  # present + absent
        want = int(npop(cur, probe).sum())
        assert analytics.count_where(path, op, probe, column="cur") == want


def test_string_scan_where_cross_column(tmp_path, rng):
    path, cur, qty, _ = _tbl(tmp_path, rng)
    got = analytics.scan_where(path, "eq", "EUR", column="qty", where="cur")
    mask = cur == "EUR"
    assert got["count"] == int(mask.sum())
    assert got["sum"] == int(qty[mask].sum())
    assert got["min"] == int(qty[mask].min())
    # string-valued aggregation filtered by a numeric predicate
    got = analytics.scan_where(path, "lt", 100, column="cur", where="qty")
    sel = cur[qty < 100]
    assert got["count"] == len(sel)
    assert got["min"] == min(sel.tolist()) and got["max"] == max(sel.tolist())
    assert got["sum"] is None


def test_string_group_by_key(tmp_path, rng):
    path, cur, qty, _ = _tbl(tmp_path, rng)
    groups = analytics.group_stats(path, "cur", "qty")
    assert set(groups) == set(np.unique(cur))
    for label, s in groups.items():
        mask = cur == label
        assert s["count"] == int(mask.sum())
        assert s["sum"] == int(qty[mask].sum())
        assert s["min"] == int(qty[mask].min())
        assert s["max"] == int(qty[mask].max())


def test_string_group_by_float_value(tmp_path, rng):
    from fractions import Fraction

    path, cur, _, cols = _tbl(tmp_path, rng, n=3000, with_floats=True)
    price = cols["price"]
    groups = analytics.group_stats(path, "cur", "price")
    for label, s in groups.items():
        mask = cur == label
        want = float(sum(Fraction(float(v)) for v in price[mask]))
        assert s["sum"] == want  # exact superaccumulator per group
        assert s["min"] == float(price[mask].min())


def test_string_value_grouped_by_int(tmp_path, rng):
    path, cur, qty, _ = _tbl(tmp_path, rng)
    # group the STRING column by qty % 4 written as its own key column
    path2 = str(tmp_path / "t2.flt")
    fio_table.write_table(path2, {"k": (qty % 4).astype(np.uint32),
                                  "cur": cur})
    groups = analytics.group_stats(path2, "k", "cur")
    for g, s in groups.items():
        sel = cur[qty % 4 == g]
        assert s["count"] == len(sel)
        assert s["min"] == min(sel.tolist()) and s["max"] == max(sel.tolist())
        assert s["sum"] is None


def test_string_truncated_dict_blob(tmp_path, rng):
    path, _, _, _ = _tbl(tmp_path, rng, n=1200)
    header = fio_table.read_table_header(path)
    sd = header["columns"]["cur"]["str_dict"]
    base = fio_table._payload_base(path)
    data = bytearray(open(path, "rb").read())
    trunc = data[: base + sd["offset"] + 4]  # cut inside the offsets table
    open(path, "wb").write(bytes(trunc))
    with pytest.raises(ValueError, match="truncated string dictionary"):
        fio_table.read_column(path, "cur")


def test_cli_scan_string_predicates(tmp_path, rng, capsys):
    path, cur, qty, _ = _tbl(tmp_path, rng)
    assert cli.main(["scan", path, "--column", "qty",
                     "--where", "eq:GBP", "--where-column", "cur"]) == 0
    out = json.loads(capsys.readouterr().out)
    mask = cur == "GBP"
    assert out["where"]["count"] == int(mask.sum())
    assert out["where"]["sum"] == int(qty[mask].sum())
    assert cli.main(["scan", path, "--column", "qty",
                     "--group-by", "cur"]) == 0
    groups = json.loads(capsys.readouterr().out)
    assert set(groups) == set(np.unique(cur))
