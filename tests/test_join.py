"""Dimension join: streamed left table enriched with a unique-keyed right
table, key match on device (sorted searchsorted / dictionary-code
translation). SQL semantics: inner drops unmatched, left masks them,
null keys never match."""

import numpy as np
import pytest

from fastlanes_tpu import analytics, fio_table


def _fact_dim(tmp_path, rng, n=4000):
    lpath = str(tmp_path / "fact.flt")
    rpath = str(tmp_path / "dim.flt")
    cid = rng.integers(0, 50, n).astype(np.uint32) * 3  # only multiples of 3
    qty = rng.integers(0, 100, n).astype(np.uint32)
    fio_table.write_table(lpath, {"cid": cid, "qty": qty})
    dim_ids = (np.arange(40, dtype=np.uint32) * 3)[::-1].copy()  # unsorted
    rate = np.round(rng.normal(1.0, 0.1, 40), 4)
    fio_table.write_table(rpath, {"cid": dim_ids, "rate": rate})
    lookup = dict(zip(dim_ids.tolist(), rate.tolist()))
    return lpath, rpath, cid, qty, lookup


def test_join_inner_int_key(tmp_path, rng):
    lpath, rpath, cid, qty, lookup = _fact_dim(tmp_path, rng)
    rows = analytics.join(lpath, rpath, on="cid")
    mask = np.isin(cid, list(lookup))
    np.testing.assert_array_equal(rows["cid"], cid[mask])
    np.testing.assert_array_equal(rows["qty"], qty[mask])
    want = np.array([lookup[int(c)] for c in cid[mask]])
    np.testing.assert_array_equal(rows["rate"], want)


def test_join_left_masks_unmatched(tmp_path, rng):
    lpath, rpath, cid, qty, lookup = _fact_dim(tmp_path, rng)
    rows = analytics.join(lpath, rpath, on="cid", how="left")
    assert len(rows["cid"]) == len(cid)
    np.testing.assert_array_equal(rows["cid"], cid)
    matched = np.isin(cid, list(lookup))
    got = rows["rate"]
    np.testing.assert_array_equal(np.ma.getmaskarray(got), ~matched)
    want = np.array([lookup.get(int(c), 0.0) for c in cid])
    np.testing.assert_array_equal(np.asarray(np.ma.getdata(got))[matched],
                                  want[matched])


def test_join_with_preds_and_limit(tmp_path, rng):
    lpath, rpath, cid, qty, lookup = _fact_dim(tmp_path, rng)
    rows = analytics.join(lpath, rpath, on="cid", columns=["qty"],
                          preds=[("qty", "gt", 50)], limit=9)
    mask = np.isin(cid, list(lookup)) & (qty > 50)
    np.testing.assert_array_equal(rows["qty"], qty[mask][:9])
    assert "cid" not in rows  # projection respected


def test_join_string_key(tmp_path, rng):
    lpath = str(tmp_path / "f.flt")
    rpath = str(tmp_path / "d.flt")
    n = 3000
    cur = np.array(["EUR", "GBP", "JPY", "XXX"])[rng.integers(0, 4, n)]
    qty = rng.integers(0, 100, n).astype(np.uint32)
    fio_table.write_table(lpath, {"cur": cur, "qty": qty})
    fio_table.write_table(rpath, {
        "cur": np.array(["GBP", "EUR", "JPY", "USD"]),
        "sym": np.array(["£", "€", "¥", "$"])})
    rows = analytics.join(lpath, rpath, on="cur")
    mask = cur != "XXX"
    np.testing.assert_array_equal(rows["cur"], cur[mask])
    sym_of = {"EUR": "€", "GBP": "£", "JPY": "¥"}
    assert rows["sym"].tolist() == [sym_of[c] for c in cur[mask]]
    # left join: unmatched XXX rows masked
    rows = analytics.join(lpath, rpath, on="cur", how="left",
                          columns=["qty"])
    np.testing.assert_array_equal(np.ma.getmaskarray(rows["sym"]),
                                  cur == "XXX")


def test_join_null_keys_never_match(tmp_path, rng):
    lpath = str(tmp_path / "f.flt")
    rpath = str(tmp_path / "d.flt")
    n = 2000
    k = rng.integers(0, 10, n).astype(np.uint16)
    kmask = rng.random(n) < 0.3
    fio_table.write_table(lpath, {
        "k": np.ma.MaskedArray(k, mask=kmask),
        "v": rng.integers(0, 9, n).astype(np.uint8)})
    fio_table.write_table(rpath, {
        "k": np.arange(10, dtype=np.uint16),
        "name": np.array([f"g{i}" for i in range(10)])})
    rows = analytics.join(lpath, rpath, on="k")
    assert len(rows["v"]) == int((~kmask).sum())
    rows = analytics.join(lpath, rpath, on="k", how="left",
                          columns=["v"])
    np.testing.assert_array_equal(np.ma.getmaskarray(rows["name"]), kmask)


def test_join_name_collision_and_sharded_left(tmp_path, rng):
    rpath = str(tmp_path / "d.flt")
    fio_table.write_table(rpath, {
        "k": np.arange(5, dtype=np.uint16),
        "v": np.arange(5, dtype=np.uint32) * 100})
    lpaths, ks, vs = [], [], []
    for i in range(2):
        kk = rng.integers(0, 5, 1500).astype(np.uint16)
        vv = rng.integers(0, 9, 1500).astype(np.uint32)
        p = str(tmp_path / f"l{i}.flt")
        fio_table.write_table(p, {"k": kk, "v": vv})
        lpaths.append(p)
        ks.append(kk)
        vs.append(vv)
    rows = analytics.join(lpaths, rpath, on="k")
    kk, vv = np.concatenate(ks), np.concatenate(vs)
    np.testing.assert_array_equal(rows["v"], vv)          # left's v
    np.testing.assert_array_equal(rows["v_right"], kk * 100)  # right's v


def test_join_errors(tmp_path, rng):
    lpath = str(tmp_path / "f.flt")
    rpath = str(tmp_path / "d.flt")
    fio_table.write_table(lpath, {"k": np.arange(1200, dtype=np.uint16)})
    fio_table.write_table(rpath, {"k": np.array([1, 1, 2], np.uint16),
                                  "x": np.arange(3, dtype=np.uint8)})
    with pytest.raises(ValueError, match="duplicates"):
        analytics.join(lpath, rpath, on="k")
    rpath2 = str(tmp_path / "d2.flt")
    fio_table.write_table(rpath2, {"k": np.array([1, 2], np.uint32),
                                   "x": np.arange(2, dtype=np.uint8)})
    with pytest.raises(ValueError, match="dtypes differ"):
        analytics.join(lpath, rpath2, on="k")
    with pytest.raises(ValueError, match="inner.*left|how"):
        analytics.join(lpath, rpath2, on="k", how="outer")
