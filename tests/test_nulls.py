"""Nullable columns: per-block validity bitmaps + forward-filled values
(null compression). The mask is the source of truth; fillers keep
delta/rle/dict widths tight. Beyond the Rust reference crate (integers
only, no null concept — /root/reference/src/lib.rs)."""

import numpy as np
import pytest

from fastlanes_tpu import fio, fio_table
from fastlanes_tpu.core import layout


def _ma_equal(got, want_data, want_mask):
    assert isinstance(got, np.ma.MaskedArray)
    np.testing.assert_array_equal(np.ma.getmaskarray(got).reshape(-1),
                                  np.asarray(want_mask).reshape(-1))
    ok = ~np.asarray(want_mask).reshape(-1)
    np.testing.assert_array_equal(np.asarray(np.ma.getdata(got)).reshape(-1)[ok],
                                  np.asarray(want_data).reshape(-1)[ok])


def test_validity_blob_roundtrip(rng):
    mask = rng.random(5 * layout.BLOCK) < 0.3
    blob = fio.encode_validity(mask, 5)
    assert len(blob) == 5 * 128
    np.testing.assert_array_equal(fio.decode_validity(blob, 5).reshape(-1),
                                  ~mask)
    with pytest.raises(ValueError, match="truncated validity"):
        fio.decode_validity(blob[:-1], 5)


def test_fill_nulls_forward():
    v = np.array([9, 1, 2, 3, 4], np.uint32)
    m = np.array([True, False, True, True, False])
    np.testing.assert_array_equal(fio.fill_nulls(v, m), [1, 1, 1, 1, 4])
    # all-null
    np.testing.assert_array_equal(fio.fill_nulls(v, np.ones(5, bool)),
                                  np.zeros(5, np.uint32))


def test_nullable_file_roundtrip(tmp_path, rng):
    path = str(tmp_path / "n.flt")
    n = 3000
    data = rng.integers(0, 1 << 20, n, np.int64).astype(np.uint32)
    mask = rng.random(n) < 0.25
    header = fio.write_file(path, np.ma.MaskedArray(data, mask=mask))
    assert header["nulls"]["n_null"] == int(mask.sum())
    got = fio.read_file(path)
    _ma_equal(got, data, mask)
    # block-range read keeps the right mask slice (tail block padding
    # counts as present; n_values trims it only on full flat reads)
    got = fio.read_blocks(path, 1, 3)
    filled = fio.fill_nulls(data, mask)
    pad = 3072 - n
    want_data = np.concatenate([filled[1024:], np.repeat(filled[-1], pad)])
    want_mask = np.concatenate([mask[1024:], np.zeros(pad, bool)])
    _ma_equal(got, want_data.reshape(2, -1), want_mask.reshape(2, -1))
    # read_single: masked sentinel at null positions, value elsewhere
    i_null = int(np.flatnonzero(mask)[0])
    i_ok = int(np.flatnonzero(~mask)[0])
    assert fio.read_single(path, i_null // 1024, i_null % 1024) is np.ma.masked
    assert fio.read_single(path, i_ok // 1024, i_ok % 1024) == data[i_ok]


def test_nulls_keep_compression_tight(tmp_path, rng):
    # sorted column with scattered nulls: forward-fill keeps delta narrow
    path = str(tmp_path / "s.flt")
    n = 4096
    data = np.sort(rng.integers(0, 1 << 30, n, np.int64).astype(np.uint32))
    mask = rng.random(n) < 0.2
    header = fio.write_file(path, np.ma.MaskedArray(data, mask=mask))
    assert {c["codec"] for c in header["chunks"]} <= {"delta", "zdelta", "ffor"}
    _ma_equal(fio.read_file(path), data, mask)


def test_nullable_signed_and_float(tmp_path, rng):
    n = 2500
    ps = str(tmp_path / "sg.flt")
    sdata = rng.integers(-(1 << 20), 1 << 20, n, np.int64).astype(np.int32)
    smask = rng.random(n) < 0.3
    fio.write_file(ps, np.ma.MaskedArray(sdata, mask=smask))
    got = fio.read_file(ps)
    assert np.ma.getdata(got).dtype == np.int32
    _ma_equal(got, sdata, smask)

    pf = str(tmp_path / "fl.flt")
    fdata = rng.normal(50.0, 10.0, n).astype(np.float64)
    fmask = rng.random(n) < 0.3
    fio.write_file(pf, np.ma.MaskedArray(fdata, mask=fmask))
    got = fio.read_file(pf)
    assert np.ma.getdata(got).dtype == np.float64
    _ma_equal(got, fdata, fmask)


def test_nullable_u64(tmp_path, rng):
    path = str(tmp_path / "n64.flt")
    n = 2100
    data = rng.integers(0, 1 << 45, n, np.int64).astype(np.uint64)
    mask = rng.random(n) < 0.2
    fio.write_file(path, np.ma.MaskedArray(data, mask=mask), dtype="u64")
    _ma_equal(fio.read_file(path), data, mask)


def test_nullable_table_columns(tmp_path, rng):
    path = str(tmp_path / "t.flt")
    n = 3000
    qty = rng.integers(0, 500, n, np.int64).astype(np.uint32)
    qmask = rng.random(n) < 0.3
    cats = ["EUR", "GBP", "JPY", None]
    cur = np.array([cats[i] for i in rng.integers(0, 4, n)], dtype=object)
    cmask = np.array([c is None for c in cur])
    price = rng.normal(10.0, 2.0, n).astype(np.float32)
    pmask = rng.random(n) < 0.1
    fio_table.write_table(path, {
        "qty": np.ma.MaskedArray(qty, mask=qmask),
        "cur": cur,
        "price": np.ma.MaskedArray(price, mask=pmask),
        "plain": qty,
    })
    header = fio_table.read_table_header(path)
    assert header["columns"]["qty"]["nulls"]["n_null"] == int(qmask.sum())
    assert "nulls" not in header["columns"]["plain"]
    _ma_equal(fio_table.read_column(path, "qty"), qty, qmask)
    _ma_equal(fio_table.read_column(path, "price"), price, pmask)
    got = fio_table.read_column(path, "cur")
    assert isinstance(got, np.ma.MaskedArray)
    np.testing.assert_array_equal(np.ma.getmaskarray(got), cmask)
    np.testing.assert_array_equal(np.asarray(np.ma.getdata(got))[~cmask],
                                  cur[~cmask].astype(str))
    # block-range read of a nullable string column
    got = fio_table.read_column(path, "cur", start=1, stop=2)
    np.testing.assert_array_equal(np.ma.getmaskarray(got).reshape(-1),
                                  cmask[1024:2048])
    # plain column untouched
    assert not isinstance(fio_table.read_column(path, "plain"),
                          np.ma.MaskedArray)


def test_all_null_column(tmp_path):
    path = str(tmp_path / "an.flt")
    data = np.zeros(1500, np.uint32)
    fio.write_file(path, np.ma.MaskedArray(data, mask=np.ones(1500, bool)))
    got = fio.read_file(path)
    assert np.ma.getmaskarray(got).all() and got.size == 1500


# ---------------------------------------------------------------------------
# device reads + analytics null-awareness


def test_nullable_device_reads(tmp_path, rng):
    from fastlanes_tpu import fio_device

    n = 2600
    data = rng.integers(0, 1 << 20, n, np.int64).astype(np.uint32)
    mask = rng.random(n) < 0.3
    path = str(tmp_path / "n.flt")
    fio.write_file(path, np.ma.MaskedArray(data, mask=mask))
    col = fio_device.read_file_device(path)
    assert isinstance(col, fio_device.NullableColumn)
    assert col.n_null == int(mask.sum())
    _ma_equal(col.materialize(), data, mask)
    # table column device read, string + nulls composes both carriers
    cats = ["a", "bb", None, "ccc"]
    cur = np.array([cats[i] for i in rng.integers(0, 4, n)], dtype=object)
    cmask = np.array([c is None for c in cur])
    tpath = str(tmp_path / "t.flt")
    fio_table.write_table(tpath, {"cur": cur,
                                  "qty": np.ma.MaskedArray(data, mask=mask)})
    qcol = fio_device.read_column_device(tpath, "qty")
    _ma_equal(qcol.materialize(), data, mask)
    scol = fio_device.read_column_device(tpath, "cur")
    assert isinstance(scol, fio_device.NullableColumn)
    got = scol.materialize()
    np.testing.assert_array_equal(np.ma.getmaskarray(got), cmask)
    np.testing.assert_array_equal(np.asarray(np.ma.getdata(got))[~cmask],
                                  cur[~cmask].astype(str))


def test_nullable_multi_file_device_reads(tmp_path, rng):
    from fastlanes_tpu import fio_device

    paths, datas, masks = [], [], []
    for i in range(3):
        n = 1500 + 17 * i
        data = rng.integers(0, 1 << 16, n, np.int64).astype(np.uint32)
        mask = rng.random(n) < 0.2
        p = str(tmp_path / f"f{i}.flt")
        fio.write_file(p, np.ma.MaskedArray(data, mask=mask))
        paths.append(p)
        datas.append(data)
        masks.append(mask)
    out = fio_device.read_files_device(paths)
    for p, d, m in zip(paths, datas, masks):
        _ma_equal(out[p].materialize(), d, m)
    for (p, col), d, m in zip(fio_device.iter_files_device(paths), datas,
                              masks):
        _ma_equal(col.materialize(), d, m)


def test_null_aware_scans(tmp_path, rng):
    from fastlanes_tpu import analytics

    n = 4000
    data = rng.integers(0, 1000, n, np.int64).astype(np.uint32)
    mask = rng.random(n) < 0.3
    path = str(tmp_path / "n.flt")
    fio.write_file(path, np.ma.MaskedArray(data, mask=mask))
    ok = ~mask
    s = analytics.scan_column(path)
    assert s["count"] == int(ok.sum())
    assert s["sum"] == int(data[ok].sum())
    assert s["min"] == int(data[ok].min()) and s["max"] == int(data[ok].max())
    assert s["n_null"] == int(mask.sum())
    # predicates: nulls match nothing, not even 'ne'
    assert analytics.count_where(path, "gt", 500) == int((data[ok] > 500).sum())
    assert analytics.count_where(path, "ne", data[ok][0]) == \
        int((data[ok] != data[ok][0]).sum())
    sw = analytics.scan_where(path, "le", 250)
    sel = data[ok & (data <= 250)]
    assert sw["count"] == len(sel) and sw["sum"] == int(sel.sum())
    # distinct / value_counts / top_k exclude nulls
    np.testing.assert_array_equal(analytics.distinct(path),
                                  np.unique(data[ok]))
    vc = analytics.value_counts(path)
    want = dict(zip(*np.unique(data[ok], return_counts=True)))
    assert vc == {int(a): int(b) for a, b in want.items()}
    assert analytics.top_k(path, k=5) == np.sort(data[ok])[::-1][:5].tolist()
    assert analytics.top_k(path, k=5, largest=False) == \
        np.sort(data[ok])[:5].tolist()


def test_null_aware_float_scan(tmp_path, rng):
    from fractions import Fraction

    from fastlanes_tpu import analytics

    n = 2200
    data = rng.normal(10.0, 3.0, n).astype(np.float64)
    mask = rng.random(n) < 0.25
    path = str(tmp_path / "f.flt")
    fio.write_file(path, np.ma.MaskedArray(data, mask=mask))
    ok = ~mask
    s = analytics.scan_column(path)
    assert s["count"] == int(ok.sum())
    assert s["sum"] == float(sum(Fraction(float(v)) for v in data[ok]))
    assert s["min"] == float(data[ok].min())
    assert s["n_null"] == int(mask.sum())


def test_null_aware_group_and_cross_column(tmp_path, rng):
    from fastlanes_tpu import analytics

    n = 3000
    key = rng.integers(0, 5, n, np.int64).astype(np.uint16)
    kmask = rng.random(n) < 0.2
    val = rng.integers(0, 100, n, np.int64).astype(np.uint32)
    vmask = rng.random(n) < 0.2
    path = str(tmp_path / "t.flt")
    fio_table.write_table(path, {
        "k": np.ma.MaskedArray(key, mask=kmask),
        "v": np.ma.MaskedArray(val, mask=vmask),
    })
    groups = analytics.group_stats(path, "k", "v")
    both = ~kmask & ~vmask
    for g in range(5):
        sel = val[both & (key == g)]
        if len(sel) == 0:
            assert g not in groups
            continue
        assert groups[g]["count"] == len(sel)
        assert groups[g]["sum"] == int(sel.sum())
        assert groups[g]["min"] == int(sel.min())
    # cross-column scan_where: null predicate rows match nothing, null
    # value rows don't aggregate
    sw = analytics.scan_where(path, "eq", 3, column="v", where="k")
    sel = val[both & (key == 3)]
    assert sw["count"] == len(sel) and sw["sum"] == int(sel.sum())


def test_all_null_analytics(tmp_path):
    from fastlanes_tpu import analytics

    path = str(tmp_path / "an.flt")
    fio.write_file(path, np.ma.MaskedArray(np.zeros(1100, np.uint32),
                                           mask=np.ones(1100, bool)))
    s = analytics.scan_column(path)
    assert s["count"] == 0 and s["sum"] == 0
    assert s["n_null"] == 1100
    assert analytics.distinct(path).size == 0
    assert analytics.top_k(path, k=3) == []
    assert analytics.value_counts(path) == {}
