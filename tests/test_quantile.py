"""Exact quantile/median pushdown: one-scan value_counts path for
low-cardinality domains, value-domain binary search over exact count_where
otherwise (total-order key space for floats)."""

import numpy as np
import pytest

from fastlanes_tpu import analytics, fio, fio_table


def _nq(a, q):
    return np.quantile(a, q, method="lower")


def test_quantile_low_cardinality_onescan(tmp_path, rng):
    path = str(tmp_path / "v.flt")
    vals = rng.integers(0, 50, 5000).astype(np.uint32)
    fio.write_file(path, vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        assert analytics.quantile(path, q=q) == _nq(vals, q)
    assert analytics.median(path) == _nq(vals, 0.5)
    got = analytics.quantile(path, q=[0.1, 0.5])
    assert got == [_nq(vals, 0.1), _nq(vals, 0.5)]


def test_quantile_binary_search_wide_ints(tmp_path, rng):
    path = str(tmp_path / "w.flt")
    vals = rng.integers(0, 1 << 30, 70000).astype(np.uint32)  # >65536 distinct
    fio.write_file(path, vals)
    assert analytics.quantile(path, q=0.5) == _nq(vals, 0.5)
    # signed
    ps = str(tmp_path / "s.flt")
    sv = rng.integers(-(1 << 29), 1 << 29, 70000).astype(np.int32)
    fio.write_file(ps, sv)
    assert analytics.quantile(ps, q=0.25) == _nq(sv, 0.25)


def test_quantile_floats(tmp_path, rng):
    for dt in (np.float32, np.float64):
        path = str(tmp_path / f"f{np.dtype(dt).itemsize}.flt")
        vals = rng.normal(0, 100, 4000).astype(dt)
        fio.write_file(path, vals)
        got = analytics.quantile(path, q=0.5)
        assert got == float(_nq(vals, 0.5))
        assert analytics.quantile(path, q=0.9) == float(_nq(vals, 0.9))


def test_quantile_u64_strings_bool(tmp_path, rng):
    path = str(tmp_path / "t.flt")
    big = rng.integers(0, 1 << 45, 3000).astype(np.uint64)
    cur = np.array(["a", "bb", "c", "dd"])[rng.integers(0, 4, 3000)]
    flag = rng.random(3000) < 0.3
    fio_table.write_table(path, {"big": big, "cur": cur, "flag": flag})
    assert analytics.quantile(path, "big", 0.5) == int(_nq(big, 0.5))
    assert analytics.quantile(path, "cur", 0.5) == \
        sorted(cur.tolist())[(3000 - 1) // 2]
    assert analytics.median(path, "flag") == bool(_nq(flag, 0.5))


def test_quantile_nulls_and_nan(tmp_path, rng):
    path = str(tmp_path / "n.flt")
    vals = rng.integers(0, 1000, 4000).astype(np.uint32)
    mask = rng.random(4000) < 0.3
    fio.write_file(path, np.ma.MaskedArray(vals, mask=mask))
    assert analytics.quantile(path, q=0.5) == _nq(vals[~mask], 0.5)
    pn = str(tmp_path / "nan.flt")
    fv = rng.normal(0, 1, 2000)
    fv[7] = np.nan
    fio.write_file(pn, fv)
    assert np.isnan(analytics.quantile(pn, q=0.5))
    pall = str(tmp_path / "all.flt")
    fio.write_file(pall, np.ma.MaskedArray(np.zeros(1100, np.uint32),
                                           mask=np.ones(1100, bool)))
    assert analytics.quantile(pall, q=0.5) is None


def test_quantile_dataset(tmp_path, rng):
    paths, parts = [], []
    for i in range(3):
        v = rng.integers(0, 1 << 25, 30000).astype(np.uint32)
        p = str(tmp_path / f"d{i}.flt")
        fio.write_file(p, v)
        paths.append(p)
        parts.append(v)
    allv = np.concatenate(parts)
    assert analytics.quantile(paths, q=0.5) == _nq(allv, 0.5)


def test_quantile_validation(tmp_path, rng):
    path = str(tmp_path / "v.flt")
    fio.write_file(path, rng.integers(0, 9, 1100).astype(np.uint32))
    with pytest.raises(ValueError, match="quantiles"):
        analytics.quantile(path, q=1.5)
