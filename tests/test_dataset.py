"""Sharded-dataset analytics: every entry point accepts a LIST of paths
and scans file-by-file with exact merges (shared accumulators for numeric
domains; label-level merges where each file owns a dictionary)."""

from fractions import Fraction

import numpy as np

from fastlanes_tpu import analytics, fio, fio_table


def _shards(tmp_path, rng, n_files=3, n=2500):
    paths, qty, cur, price = [], [], [], []
    for i in range(n_files):
        q = rng.integers(0, 1000, n).astype(np.uint32)
        # per-file category sets OVERLAP but differ -> per-file dictionaries
        cats = np.array(["EUR", "GBP", "JPY", "USD"])[i % 2:][:3]
        c = cats[rng.integers(0, len(cats), n)]
        pr = rng.normal(100.0, 5.0, n).astype(np.float64)
        p = str(tmp_path / f"s{i}.flt")
        fio_table.write_table(p, {"qty": q, "cur": c, "price": pr})
        paths.append(p)
        qty.append(q)
        cur.append(c)
        price.append(pr)
    return paths, np.concatenate(qty), np.concatenate(cur), \
        np.concatenate(price)


def test_dataset_scans(tmp_path, rng):
    paths, qty, cur, price = _shards(tmp_path, rng)
    s = analytics.scan_column(paths, "qty")
    assert s["sum"] == int(qty.sum()) and s["count"] == len(qty)
    assert s["min"] == int(qty.min()) and s["max"] == int(qty.max())
    # float sums stay EXACT across files (one shared superaccumulator)
    s = analytics.scan_column(paths, "price")
    assert s["sum"] == float(sum(Fraction(float(v)) for v in price))
    # string column: label-level merge across per-file dictionaries
    s = analytics.scan_column(paths, "cur")
    assert s["count"] == len(cur)
    assert s["min"] == min(cur.tolist()) and s["max"] == max(cur.tolist())
    st = analytics.scan_table(paths)
    assert st["qty"]["sum"] == int(qty.sum())


def test_dataset_where_and_counts(tmp_path, rng):
    paths, qty, cur, price = _shards(tmp_path, rng)
    assert analytics.count_where(paths, "gt", 500, column="qty") == \
        int((qty > 500).sum())
    # string predicate translates against EACH file's dictionary
    assert analytics.count_where(paths, "eq", "GBP", column="cur") == \
        int((cur == "GBP").sum())
    sw = analytics.scan_where(paths, "eq", "GBP", column="qty", where="cur")
    mask = cur == "GBP"
    assert sw["count"] == int(mask.sum()) and sw["sum"] == int(qty[mask].sum())
    got = analytics.scan_where_multi(
        paths, [("cur", "ne", "JPY"), ("qty", "le", 300)], column="qty")
    mask = (cur != "JPY") & (qty <= 300)
    assert got["count"] == int(mask.sum())
    assert got["sum"] == int(qty[mask].sum())


def test_dataset_group_by(tmp_path, rng):
    paths, qty, cur, price = _shards(tmp_path, rng)
    groups = analytics.group_stats(paths, "cur", "qty")
    assert set(groups) == set(np.unique(cur))
    for label, s in groups.items():
        mask = cur == label
        assert s["count"] == int(mask.sum())
        assert s["sum"] == int(qty[mask].sum())  # int sums exact
        assert s["min"] == int(qty[mask].min())
    # integer-keyed groups over the dataset share one exact accumulator
    kpaths = []
    ks, vs = [], []
    for i in range(2):
        kk = rng.integers(0, 5, 2000).astype(np.uint16)
        vv = rng.normal(10.0, 2.0, 2000).astype(np.float64)
        p = str(tmp_path / f"k{i}.flt")
        fio_table.write_table(p, {"k": kk, "v": vv})
        kpaths.append(p)
        ks.append(kk)
        vs.append(vv)
    kk, vv = np.concatenate(ks), np.concatenate(vs)
    groups = analytics.group_stats(kpaths, "k", "v")
    for g, s in groups.items():
        sel = vv[kk == g]
        assert s["sum"] == float(sum(Fraction(float(x)) for x in sel))


def test_dataset_pushdowns(tmp_path, rng):
    paths, qty, cur, price = _shards(tmp_path, rng)
    np.testing.assert_array_equal(analytics.distinct(paths, "qty"),
                                  np.unique(qty))
    np.testing.assert_array_equal(analytics.distinct(paths, "cur"),
                                  np.unique(cur))
    vc = analytics.value_counts(paths, "cur")
    want = dict(zip(*np.unique(cur, return_counts=True)))
    assert vc == {str(k): int(v) for k, v in want.items()}
    assert analytics.top_k(paths, "qty", k=7) == \
        np.sort(qty)[::-1][:7].tolist()
    assert analytics.top_k(paths, "price", k=3, largest=False) == \
        np.sort(price)[:3].tolist()
    assert analytics.top_k(paths, "cur", k=2) == \
        sorted(cur.tolist())[-2:][::-1]


def test_dataset_select(tmp_path, rng):
    paths, qty, cur, price = _shards(tmp_path, rng)
    rows = analytics.select(paths, columns=["qty", "cur"],
                            preds=[("cur", "eq", "EUR")])
    mask = cur == "EUR"
    np.testing.assert_array_equal(rows["qty"], qty[mask])
    assert all(c == "EUR" for c in rows["cur"].tolist())
    # LIMIT in file order stops early
    rows = analytics.select(paths, columns=["qty"], limit=3000)
    np.testing.assert_array_equal(rows["qty"], qty[:3000])
    # ORDER BY ... LIMIT across shards: per-file top-k then a host merge
    rows = analytics.select(paths, columns=["qty", "cur"],
                            order_by="price", desc=True, limit=8)
    order = np.argsort(price, kind="stable")[::-1][:8]
    np.testing.assert_array_equal(rows["qty"], qty[order])
    assert "price" not in rows  # order column not in the projection
    # ORDER BY without LIMIT
    rows = analytics.select(paths, columns=["qty"],
                            preds=[("qty", "lt", 50)], order_by="qty")
    np.testing.assert_array_equal(rows["qty"], np.sort(qty[qty < 50]))


def test_dataset_single_column_files(tmp_path, rng):
    paths, datas = [], []
    for i in range(3):
        d = rng.integers(0, 100, 1800).astype(np.uint32)
        p = str(tmp_path / f"c{i}.flt")
        fio.write_file(p, d)
        paths.append(p)
        datas.append(d)
    allv = np.concatenate(datas)
    assert analytics.scan_column(paths)["sum"] == int(allv.sum())
    assert analytics.count_where(paths, "lt", 10) == int((allv < 10).sum())
    assert analytics.top_k(paths, k=4) == np.sort(allv)[::-1][:4].tolist()
