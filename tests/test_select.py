"""Multi-predicate WHERE pushdown (scan_where_multi) and row
materialization (select): projection + selection over compressed tables,
string/null aware — the SQL-ish query surface on top of the chunk codecs."""

import json

import numpy as np
import pytest

from fastlanes_tpu import analytics, cli, fio, fio_table


def _tbl(tmp_path, rng, n=5000, nulls=False):
    path = str(tmp_path / "t.flt")
    cur = np.array(["EUR", "GBP", "JPY", "USD"])[rng.integers(0, 4, n)]
    qty = rng.integers(0, 1000, n).astype(np.uint32)
    price = rng.normal(100.0, 10.0, n).astype(np.float64)
    sid = rng.integers(-500, 500, n).astype(np.int32)
    cols = {"cur": cur, "qty": qty, "price": price, "sid": sid}
    if nulls:
        qmask = rng.random(n) < 0.2
        cols["qty"] = np.ma.MaskedArray(qty, mask=qmask)
        return path, dict(cur=cur, qty=qty, price=price, sid=sid,
                          qmask=qmask), fio_table.write_table(path, cols)
    fio_table.write_table(path, cols)
    return path, dict(cur=cur, qty=qty, price=price, sid=sid, qmask=None), None


def test_scan_where_multi(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng)
    got = analytics.scan_where_multi(
        path, [("cur", "eq", "EUR"), ("qty", "gt", 500)], column="price")
    mask = (c["cur"] == "EUR") & (c["qty"] > 500)
    assert got["count"] == int(mask.sum())
    assert got["min"] == float(c["price"][mask].min())
    # three predicates incl. a signed column
    got = analytics.scan_where_multi(
        path, [("cur", "ne", "JPY"), ("qty", "le", 800), ("sid", "ge", 0)],
        column="qty")
    mask = (c["cur"] != "JPY") & (c["qty"] <= 800) & (c["sid"] >= 0)
    assert got["count"] == int(mask.sum())
    assert got["sum"] == int(c["qty"][mask].sum())


def test_scan_where_multi_single_file(tmp_path, rng):
    path = str(tmp_path / "c.flt")
    vals = rng.integers(0, 100, 3000).astype(np.uint32)
    fio.write_file(path, vals)
    got = analytics.scan_where_multi(
        path, [(None, "gt", 10), (None, "lt", 90)])
    mask = (vals > 10) & (vals < 90)
    assert got["count"] == int(mask.sum())
    assert got["sum"] == int(vals[mask].sum())


def test_select_basic(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng)
    rows = analytics.select(path, columns=["qty", "cur", "price", "sid"],
                            preds=[("cur", "eq", "GBP"),
                                   ("qty", "ge", 900)])
    mask = (c["cur"] == "GBP") & (c["qty"] >= 900)
    np.testing.assert_array_equal(rows["qty"], c["qty"][mask])
    np.testing.assert_array_equal(rows["cur"], c["cur"][mask])
    np.testing.assert_array_equal(rows["price"], c["price"][mask])
    np.testing.assert_array_equal(rows["sid"], c["sid"][mask])


def test_select_limit_and_projection(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng)
    rows = analytics.select(path, columns=["qty"],
                            preds=[("qty", "lt", 500)], limit=7)
    want = c["qty"][c["qty"] < 500][:7]
    np.testing.assert_array_equal(rows["qty"], want)
    assert set(rows) == {"qty"}
    # no predicates: first `limit` rows
    rows = analytics.select(path, columns=["cur"], limit=3)
    np.testing.assert_array_equal(rows["cur"], c["cur"][:3])


def test_select_nullable(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng, nulls=True)
    # predicate on the NULLABLE column: null rows never match
    rows = analytics.select(path, columns=["qty", "cur"],
                            preds=[("qty", "gt", 500)])
    mask = (c["qty"] > 500) & ~c["qmask"]
    np.testing.assert_array_equal(np.ma.getdata(rows["qty"]), c["qty"][mask])
    assert not np.ma.getmaskarray(rows["qty"]).any()
    np.testing.assert_array_equal(rows["cur"], c["cur"][mask])
    # predicate elsewhere: selected nullable column keeps its mask
    rows = analytics.select(path, columns=["qty"],
                            preds=[("cur", "eq", "USD")])
    sel = c["cur"] == "USD"
    np.testing.assert_array_equal(np.ma.getmaskarray(rows["qty"]),
                                  c["qmask"][sel])
    ok = ~c["qmask"][sel]
    np.testing.assert_array_equal(np.asarray(np.ma.getdata(rows["qty"]))[ok],
                                  c["qty"][sel][ok])


def test_select_u64_and_f64_domains(tmp_path, rng):
    path = str(tmp_path / "u.flt")
    n = 2500
    big = rng.integers(0, 1 << 45, n, np.int64).astype(np.uint64)
    price = rng.normal(5.0, 1.0, n).astype(np.float64)
    fio_table.write_table(path, {"big": big, "price": price,
                                 "k": rng.integers(0, 9, n).astype(np.uint8)})
    rows = analytics.select(path, columns=["big", "price"],
                            preds=[("k", "eq", 3)])
    k = fio_table.read_column(path, "k")
    mask = k == 3
    np.testing.assert_array_equal(rows["big"], big[mask])
    np.testing.assert_array_equal(rows["price"], price[mask])


def test_select_errors(tmp_path, rng):
    path = str(tmp_path / "c.flt")
    fio.write_file(path, rng.integers(0, 9, 2048).astype(np.uint32))
    with pytest.raises(ValueError, match="FLTTAB table"):
        analytics.select(path)
    tpath, _, _ = _tbl(tmp_path, rng, n=1200)
    with pytest.raises(ValueError, match="unknown predicate"):
        analytics.scan_where_multi(tpath, [("qty", "between", 3)],
                                   column="qty")


def test_cli_select(tmp_path, rng, capsys):
    path, c, _ = _tbl(tmp_path, rng)
    out = str(tmp_path / "rows.npz")
    assert cli.main(["select", path, out, "--where", "cur:eq:JPY",
                     "--where", "qty:gt:750", "--columns", "qty,price",
                     "--limit", "50"]) == 0
    info = json.loads(capsys.readouterr().out)
    mask = (c["cur"] == "JPY") & (c["qty"] > 750)
    want_n = min(50, int(mask.sum()))
    assert info["rows"] == want_n
    got = np.load(out)
    np.testing.assert_array_equal(got["qty"], c["qty"][mask][:want_n])
    np.testing.assert_array_equal(got["price"], c["price"][mask][:want_n])


def test_select_order_by_limit_pushdown(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng)
    rows = analytics.select(path, columns=["qty", "cur"],
                            preds=[("cur", "ne", "USD")],
                            order_by="qty", desc=True, limit=10)
    mask = c["cur"] != "USD"
    order = np.argsort(c["qty"][mask], kind="stable")[::-1][:10]
    np.testing.assert_array_equal(rows["qty"], c["qty"][mask][order])
    # ties can reorder cur arbitrarily; compare the multiset per qty value
    import collections
    got = collections.Counter(zip(rows["qty"].tolist(), rows["cur"].tolist()))
    # reconstruct expected counter from all rows achieving the top-10 cut
    want_qty = c["qty"][mask][order]
    assert sorted(rows["qty"].tolist(), reverse=True) == rows["qty"].tolist()
    for q, cur_v in got:
        assert ((c["qty"] == q) & (c["cur"] == cur_v) & mask).sum() >= 1
    # ascending
    rows = analytics.select(path, columns=["qty"], order_by="qty", limit=5)
    np.testing.assert_array_equal(rows["qty"], np.sort(c["qty"])[:5])


def test_select_order_by_float_and_string(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng)
    rows = analytics.select(path, columns=["price"], order_by="price",
                            desc=True, limit=7)
    np.testing.assert_array_equal(rows["price"],
                                  np.sort(c["price"])[::-1][:7])
    # order by a STRING column (lexicographic via dictionary codes)
    rows = analytics.select(path, columns=["cur"], order_by="cur", limit=4)
    assert rows["cur"].tolist() == sorted(c["cur"].tolist())[:4]


def test_select_order_by_without_limit(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng, n=3000)
    rows = analytics.select(path, columns=["qty", "sid"],
                            preds=[("qty", "lt", 100)], order_by="sid")
    mask = c["qty"] < 100
    order = np.argsort(c["sid"][mask], kind="stable")
    np.testing.assert_array_equal(rows["sid"], c["sid"][mask][order])
    np.testing.assert_array_equal(rows["qty"], c["qty"][mask][order])


def test_select_order_by_nullable_keys(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng, nulls=True)
    # top-k pushdown: null order keys never rank
    rows = analytics.select(path, columns=["qty"], order_by="qty",
                            desc=True, limit=6)
    ok = ~c["qmask"]
    np.testing.assert_array_equal(np.ma.getdata(rows["qty"]),
                                  np.sort(c["qty"][ok])[::-1][:6])
    # host-sort path: null keys sort last
    rows = analytics.select(path, columns=["qty"],
                            preds=[("cur", "eq", "EUR")], order_by="qty")
    sel = c["cur"] == "EUR"
    n_null = int((c["qmask"] & sel).sum())
    got_mask = np.ma.getmaskarray(rows["qty"])
    assert got_mask[len(got_mask) - n_null:].all()
    np.testing.assert_array_equal(
        np.asarray(np.ma.getdata(rows["qty"]))[:len(got_mask) - n_null],
        np.sort(c["qty"][sel & ok]))


def test_cli_select_order_by(tmp_path, rng, capsys):
    path, c, _ = _tbl(tmp_path, rng)
    out = str(tmp_path / "top.npz")
    assert cli.main(["select", path, out, "--columns", "qty",
                     "--order-by", "qty", "--desc", "--limit", "3"]) == 0
    json.loads(capsys.readouterr().out)
    got = np.load(out)
    np.testing.assert_array_equal(got["qty"], np.sort(c["qty"])[::-1][:3])


def test_select_and_multi_where_on_mesh(tmp_path, rng):
    from fastlanes_tpu import parallel

    path, c, _ = _tbl(tmp_path, rng, n=4096)
    mesh = parallel.make_mesh()
    rows = analytics.select(path, columns=["qty"],
                            preds=[("cur", "eq", "EUR")], mesh=mesh)
    np.testing.assert_array_equal(rows["qty"], c["qty"][c["cur"] == "EUR"])
    got = analytics.scan_where_multi(
        path, [("cur", "eq", "EUR"), ("qty", "gt", 500)], column="qty",
        mesh=mesh)
    mask = (c["cur"] == "EUR") & (c["qty"] > 500)
    assert got["count"] == int(mask.sum())
    assert got["sum"] == int(c["qty"][mask].sum())
    rows = analytics.select(path, columns=["qty"], order_by="qty",
                            desc=True, limit=4, mesh=mesh)
    np.testing.assert_array_equal(rows["qty"], np.sort(c["qty"])[::-1][:4])


def test_in_predicates(tmp_path, rng):
    path, c, _ = _tbl(tmp_path, rng)
    # integer IN via sorted-set membership
    probe = [3, 700, 999, 5000]  # 5000 out of data range
    n = analytics.count_where(path, "in", probe, column="qty")
    assert n == int(np.isin(c["qty"], probe).sum())
    n = analytics.count_where(path, "notin", probe, column="qty")
    assert n == int((~np.isin(c["qty"], probe)).sum())
    # string IN translates to dictionary codes (absent probes drop)
    got = analytics.scan_where(path, "in", ["EUR", "JPY", "XXX"],
                               column="qty", where="cur")
    mask = np.isin(c["cur"], ["EUR", "JPY"])
    assert got["count"] == int(mask.sum())
    assert got["sum"] == int(c["qty"][mask].sum())
    # float IN: exact equality semantics per probe
    v0 = float(c["price"][0])
    n = analytics.count_where(path, "in", [v0, 1e99], column="price")
    assert n == int((c["price"] == v0).sum())
    # select + multi-pred with IN, and signed membership
    rows = analytics.select(
        path, columns=["qty"],
        preds=[("cur", "in", ["GBP", "USD"]), ("sid", "in",
                                               list(range(-50, 51)))])
    mask = np.isin(c["cur"], ["GBP", "USD"]) & (np.abs(c["sid"]) <= 50)
    np.testing.assert_array_equal(rows["qty"], c["qty"][mask])
    # empty effective sets: in -> nothing, notin -> everything
    assert analytics.count_where(path, "in", ["ZZZ"], column="cur") == 0
    assert analytics.count_where(path, "notin", ["ZZZ"], column="cur") == \
        len(c["cur"])


def test_in_predicate_u64_and_nulls(tmp_path, rng):
    path = str(tmp_path / "u.flt")
    n = 2500
    big = (np.array([3, 9, 27, 81], np.uint64) << np.uint64(40))[
        rng.integers(0, 4, n)]
    qty = rng.integers(0, 100, n).astype(np.uint32)
    qmask = rng.random(n) < 0.3
    fio_table.write_table(path, {"big": big,
                                 "qty": np.ma.MaskedArray(qty, mask=qmask)})
    probe = [int(np.uint64(3) << np.uint64(40)),
             int(np.uint64(81) << np.uint64(40))]
    assert analytics.count_where(path, "in", probe, column="big") == \
        int(np.isin(big, np.asarray(probe, np.uint64)).sum())
    # nulls match neither in nor notin
    ok = ~qmask
    assert analytics.count_where(path, "in", [1, 2, 3], column="qty") == \
        int(np.isin(qty[ok], [1, 2, 3]).sum())
    assert analytics.count_where(path, "notin", [1, 2, 3], column="qty") == \
        int((~np.isin(qty[ok], [1, 2, 3])).sum())


def test_cli_select_in(tmp_path, rng, capsys):
    path, c, _ = _tbl(tmp_path, rng)
    out = str(tmp_path / "r.npz")
    assert cli.main(["select", path, out, "--where", "cur:in:EUR,GBP",
                     "--columns", "qty"]) == 0
    json.loads(capsys.readouterr().out)
    got = np.load(out)
    mask = np.isin(c["cur"], ["EUR", "GBP"])
    np.testing.assert_array_equal(got["qty"], c["qty"][mask])
