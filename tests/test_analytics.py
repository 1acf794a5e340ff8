"""Fused analytics over compressed columns: scan_column / count_where vs
numpy ground truth across codecs, dtypes, transforms and floats."""

import numpy as np
import pytest

from fastlanes_tpu import analytics, fio, fio_table


def test_scan_bitpack_column(tmp_path, rng):
    path = str(tmp_path / "c.flt")
    values = rng.integers(0, 1 << 12, 5000, np.int64).astype(np.uint32)
    fio.write_file(path, values, codec="bitpack")
    stats = analytics.scan_column(path)
    assert stats["count"] == 5000
    assert stats["sum"] == int(values.sum())
    assert stats["min"] == int(values.min())
    assert stats["max"] == int(values.max())


@pytest.mark.parametrize("codec", ["ffor", "delta", "zdelta", "rle"])
def test_scan_codecs(tmp_path, rng, codec):
    path = str(tmp_path / "c.flt")
    if codec == "rle":
        values = np.repeat(rng.integers(0, 1000, 100).astype(np.uint32), 50)
    else:
        values = np.sort(rng.integers(1000, 1 << 20, 4000, np.int64)
                         .astype(np.uint32))
    fio.write_file(path, values, codec=codec, chunk_blocks=2)
    stats = analytics.scan_column(path)
    assert stats["sum"] == int(values.sum())
    assert stats["min"] == int(values.min())
    assert stats["max"] == int(values.max())
    assert stats["count"] == len(values)


def test_scan_signed_column(tmp_path, rng):
    path = str(tmp_path / "s.flt")
    values = rng.integers(-500, 500, 3000, np.int64).astype(np.int32)
    fio.write_file(path, values)
    stats = analytics.scan_column(path)
    assert stats["sum"] == int(values.sum())
    assert stats["min"] == int(values.min())
    assert stats["max"] == int(values.max())


def test_scan_float_column(tmp_path, rng):
    from fractions import Fraction

    path = str(tmp_path / "f.flt")
    values = (rng.integers(0, 1 << 16, 3000) / 100.0).astype(np.float32)
    fio.write_file(path, values)
    stats = analytics.scan_column(path)
    assert stats["min"] == float(values.min())
    assert stats["max"] == float(values.max())
    assert stats["count"] == 3000
    # f32 sums are EXACT (superaccumulator): the exactly rounded real sum
    assert stats["sum"] == float(sum(Fraction(float(v)) for v in values))


def test_scan_table_column(tmp_path, rng):
    path = str(tmp_path / "t.flt")
    qty = rng.integers(0, 500, 3000).astype(np.uint16)
    fio_table.write_table(path, {"qty": qty})
    stats = analytics.scan_column(path, column="qty")
    assert stats["sum"] == int(qty.sum())
    with pytest.raises(ValueError, match="column"):
        analytics.scan_column(path)


def test_count_where(tmp_path, rng):
    path = str(tmp_path / "c.flt")
    values = rng.integers(0, 10_000, 8000, np.int64).astype(np.uint32)
    fio.write_file(path, values, chunk_blocks=3)
    for op, fn in (("gt", np.greater), ("le", np.less_equal), ("eq", np.equal)):
        want = int(fn(values, 5000).sum())
        assert analytics.count_where(path, op, 5000) == want
    with pytest.raises(ValueError, match="predicate"):
        analytics.count_where(path, "contains", 5)


def test_scan_u64_x64_free(tmp_path, rng):
    """u64 integer columns reduce exactly WITHOUT x64 jax (limb kernels)."""
    import jax

    assert not jax.config.read("jax_enable_x64")
    path = str(tmp_path / "u.flt")
    values = rng.integers(0, 1 << 40, 2048, np.int64).astype(np.uint64)
    values[17] = (1 << 62) + 12345  # exercise the high limb
    fio.write_file(path, values, codec="bitpack")
    stats = analytics.scan_column(path)
    assert stats["sum"] == int(values.sum())
    assert stats["min"] == int(values.min())
    assert stats["max"] == int(values.max())
    assert stats["count"] == len(values)
    thresh = int(np.median(values))
    for op, fn in (("gt", np.greater), ("le", np.less_equal),
                   ("eq", np.equal), ("ne", np.not_equal)):
        assert analytics.count_where(path, op, thresh) == int(
            fn(values, thresh).sum())


def test_scan_u64_signed_view(tmp_path, rng):
    """Signed i64 columns (viewu transform) reduce x64-free with int64
    min/max semantics."""
    path = str(tmp_path / "i.flt")
    values = rng.integers(-(1 << 40), 1 << 40, 3000, np.int64)
    fio.write_file(path, values)
    stats = analytics.scan_column(path)
    assert stats["sum"] == int(values.sum())
    assert stats["min"] == int(values.min())
    assert stats["max"] == int(values.max())
    assert analytics.count_where(path, "lt", 0) == int((values < 0).sum())


def _exact_f64_sum(values) -> float:
    """Ground truth: the exactly rounded sum (one rounding at the end)."""
    from fractions import Fraction

    return float(sum(Fraction(float(v)) for v in values))


def test_scan_f64_exact_x64_free(tmp_path, rng):
    """f64 columns reduce x64-FREE and EXACTLY: the limb-domain
    superaccumulator returns the exactly rounded sum — stronger than
    float64 accumulation — plus total-order min/max."""
    import jax

    assert not jax.config.read("jax_enable_x64")
    path = str(tmp_path / "f64.flt")
    values = (rng.integers(0, 1 << 16, 2048) / 100.0).astype(np.float64)
    fio.write_file(path, values)
    stats = analytics.scan_column(path)
    assert stats["sum"] == _exact_f64_sum(values)
    assert stats["min"] == float(values.min())
    assert stats["max"] == float(values.max())
    assert stats["count"] == len(values)
    # x64 ON takes the same exact path — results never depend on the flag
    jax.config.update("jax_enable_x64", True)
    try:
        assert analytics.scan_column(path) == stats
    finally:
        jax.config.update("jax_enable_x64", False)


def test_scan_f64_superaccumulator_beats_float_accumulation(tmp_path, rng):
    """Magnitude-spread data where sequential float64 accumulation collapses
    to 0: the superaccumulator keeps every 2^-1075-granularity bit. Mixes
    subnormals, -0.0, and 600-orders-of-magnitude spread."""
    tiny = (rng.standard_normal(3000) * 1e-290).astype(np.float64)
    values = np.concatenate([
        np.array([1e300]), tiny, np.array([-1e300]),
        np.array([5e-324, -0.0, 0.0, 4.9e-324]),
    ])
    path = str(tmp_path / "spread.flt")
    fio.write_file(path, values)
    np.testing.assert_array_equal(fio.read_file(path).view(np.uint64),
                                  values.view(np.uint64))
    stats = analytics.scan_column(path)
    want = _exact_f64_sum(values)
    assert stats["sum"] == want
    # naive accumulation loses the tiny tail entirely
    assert float(np.sum(values)) != want
    assert stats["min"] == float(values.min())
    assert stats["max"] == float(values.max())


def test_scan_f64_specials(tmp_path, rng):
    """NaN/inf columns follow numpy semantics: NaN poisons sum/min/max;
    +-inf dominates the sum; opposing infs give NaN."""
    import math

    base = (rng.integers(0, 1000, 2048) / 8.0).astype(np.float64)

    for specials, want_sum in (
            ([np.nan], None),                      # NaN -> everything NaN
            ([np.inf], float("inf")),
            ([-np.inf], float("-inf")),
            ([np.inf, -np.inf], None),             # opposing infs -> NaN
    ):
        values = np.concatenate([base, np.asarray(specials)])
        path = str(tmp_path / "sp.flt")
        fio.write_file(path, values)
        stats = analytics.scan_column(path)
        if want_sum is None:
            assert math.isnan(stats["sum"])
        else:
            assert stats["sum"] == want_sum
        if np.isnan(specials).any():
            assert math.isnan(stats["min"]) and math.isnan(stats["max"])
        else:
            assert stats["min"] == float(np.min(values))
            assert stats["max"] == float(np.max(values))


def test_count_where_f64_x64_free(tmp_path, rng):
    """f64 count_where via total-order key comparison: numpy semantics for
    every op, NaN positions, -0.0 == +0.0, and a NaN probe value."""
    import jax

    assert not jax.config.read("jax_enable_x64")
    values = (rng.standard_normal(4000) * 100).astype(np.float64)
    values[7] = np.nan
    values[100] = -0.0
    values[200] = 0.0
    values[300] = np.inf
    path = str(tmp_path / "c64.flt")
    fio.write_file(path, values)
    for op, fn in (("lt", np.less), ("le", np.less_equal),
                   ("gt", np.greater), ("ge", np.greater_equal),
                   ("eq", np.equal), ("ne", np.not_equal)):
        for v in (float(np.median(values[~np.isnan(values)])), 0.0, -0.0):
            want = int(fn(values, v).sum())
            assert analytics.count_where(path, op, v) == want, (op, v)
    # NaN probe: numpy counts ne=all, everything else 0
    assert analytics.count_where(path, "ne", float("nan")) == len(values)
    assert analytics.count_where(path, "eq", float("nan")) == 0
    assert analytics.count_where(path, "lt", float("nan")) == 0


def test_scan_table_multi_column(tmp_path, rng):
    """scan_table: single-pass fused stats over every column at once,
    matching per-column scan_column and numpy ground truth — mixed dtypes,
    signed transform, and a float column in one file."""
    path = str(tmp_path / "multi.flt")
    qty = rng.integers(0, 500, 3000).astype(np.uint16)
    delta = rng.integers(-900, 900, 3000, np.int64).astype(np.int32)
    price = (rng.integers(0, 1 << 16, 3000) / 100.0).astype(np.float32)
    big = rng.integers(0, 1 << 40, 3000, np.int64).astype(np.uint64)
    fio_table.write_table(
        path, {"qty": qty, "delta": delta, "price": price, "big": big},
        chunk_blocks=2)
    stats = analytics.scan_table(path)
    assert sorted(stats) == ["big", "delta", "price", "qty"]
    for name, values in (("qty", qty), ("delta", delta), ("big", big)):
        assert stats[name]["sum"] == int(values.sum()), name
        assert stats[name]["min"] == int(values.min()), name
        assert stats[name]["max"] == int(values.max()), name
        assert stats[name]["count"] == len(values), name
    assert stats["price"]["min"] == float(price.min())
    assert stats["price"]["max"] == float(price.max())
    assert abs(stats["price"]["sum"] - float(price.sum())) < 1.0
    # column subset + agreement with the one-column entry point
    sub = analytics.scan_table(path, columns=["qty"])
    assert sub == {"qty": analytics.scan_column(path, column="qty")}
    with pytest.raises(KeyError, match="no column"):
        analytics.scan_table(path, columns=["nope"])


def test_scan_f32_exact_and_specials(tmp_path, rng):
    """f32 superaccumulator: magnitude spread + subnormals + specials, all
    exact / numpy-semantics; count_where stays exact through float ops."""
    import math
    from fractions import Fraction

    values = np.concatenate([
        np.array([3e38], np.float32),
        (rng.standard_normal(3000) * 1e-30).astype(np.float32),
        np.array([-3e38, 1e-45, -0.0, 0.0], np.float32),
    ])
    path = str(tmp_path / "f32.flt")
    fio.write_file(path, values)
    stats = analytics.scan_column(path)
    want = float(sum(Fraction(float(v)) for v in values))
    assert stats["sum"] == want
    assert float(np.sum(values, dtype=np.float32)) != want  # naive f32 drifts
    assert stats["min"] == float(values.min())
    assert stats["max"] == float(values.max())
    # specials
    values2 = np.concatenate([values, np.array([np.nan], np.float32)])
    fio.write_file(path, values2)
    s2 = analytics.scan_column(path)
    assert math.isnan(s2["sum"]) and math.isnan(s2["min"])
    # count_where on the NaN-bearing column: numpy semantics
    for op, fn in (("gt", np.greater), ("ne", np.not_equal),
                   ("eq", np.equal)):
        want_n = int(fn(values2, np.float32(0.0)).sum())
        assert analytics.count_where(path, op, 0.0) == want_n, op


def test_scan_where_same_column(tmp_path, rng):
    """Filtered aggregation on one column: every dtype domain vs numpy
    boolean-mask ground truth (int exact sums, float exactly rounded)."""
    from fractions import Fraction

    # u32
    path = str(tmp_path / "w32.flt")
    values = rng.integers(0, 10_000, 6000, np.int64).astype(np.uint32)
    fio.write_file(path, values, chunk_blocks=3)
    for op, fn in (("gt", np.greater), ("le", np.less_equal)):
        m = fn(values, 5000)
        s = analytics.scan_where(path, op, 5000)
        assert s["sum"] == int(values[m].sum())
        assert s["min"] == int(values[m].min())
        assert s["max"] == int(values[m].max())
        assert s["count"] == int(m.sum())
    # zero matches: empty-aggregation semantics
    s = analytics.scan_where(path, "gt", 1 << 31)
    assert s == {"sum": 0, "min": None, "max": None, "count": 0}
    # signed i64 (u64 limb domain)
    path = str(tmp_path / "wi.flt")
    values = rng.integers(-(1 << 40), 1 << 40, 5000, np.int64)
    fio.write_file(path, values)
    m = values < 0
    s = analytics.scan_where(path, "lt", 0)
    assert s["sum"] == int(values[m].sum())
    assert s["min"] == int(values[m].min())
    assert s["max"] == int(values[m].max())
    assert s["count"] == int(m.sum())
    # f64 with NaN in the column: predicate excludes it, sum exact
    path = str(tmp_path / "wf.flt")
    fvals = (rng.standard_normal(4000) * 50).astype(np.float64)
    fvals[11] = np.nan
    fio.write_file(path, fvals)
    m = fvals > 0
    s = analytics.scan_where(path, "gt", 0.0)
    assert s["sum"] == float(sum(Fraction(float(v)) for v in fvals[m]))
    assert s["min"] == float(fvals[m].min())
    assert s["max"] == float(fvals[m].max())
    assert s["count"] == int(m.sum())


def test_scan_where_cross_column(tmp_path, rng):
    """Table cross-column predicate: aggregate `price` where `qty` matches;
    mismatched layouts rejected."""
    from fractions import Fraction

    path = str(tmp_path / "t.flt")
    qty = rng.integers(0, 100, 5000).astype(np.uint16)
    price = (rng.integers(0, 1 << 16, 5000) / 100.0).astype(np.float32)
    big = rng.integers(-(1 << 40), 1 << 40, 5000, np.int64)
    fio_table.write_table(path, {"qty": qty, "price": price, "big": big},
                          chunk_blocks=2)
    m = qty > 50
    s = analytics.scan_where(path, "gt", 50, column="price", where="qty")
    assert s["count"] == int(m.sum())
    assert s["sum"] == float(sum(Fraction(float(v)) for v in price[m]))
    assert s["min"] == float(price[m].min())
    assert s["max"] == float(price[m].max())
    # and the reverse direction: int aggregated under a float predicate
    m2 = price <= np.float32(100.0)
    s2 = analytics.scan_where(path, "le", 100.0, column="big", where="price")
    assert s2["sum"] == int(big[m2].sum())
    assert s2["count"] == int(m2.sum())
    # same-column via the `where=` spelling matches the plain call
    assert analytics.scan_where(path, "gt", 50, column="qty", where="qty") \
        == analytics.scan_where(path, "gt", 50, column="qty")
    # mismatched layout: a shorter column
    path2 = str(tmp_path / "t2.flt")
    fio_table.write_table(path2, {"a": qty, "b": qty[:3000]}, chunk_blocks=2)
    with pytest.raises(ValueError, match="mismatch|chunk"):
        analytics.scan_where(path2, "gt", 0, column="a", where="b")


def test_group_stats(tmp_path, rng):
    """GROUP BY pushdown: per-group sum/min/max/count across all four value
    domains (u32, i64 limb, f32, f64) vs numpy groupby ground truth, with
    exactness guarantees intact."""
    import math
    from fractions import Fraction

    n = 5000
    key = rng.integers(0, 7, n).astype(np.uint16)
    val32 = rng.integers(0, 100000, n, np.int64).astype(np.uint32)
    sval = rng.integers(-(1 << 40), 1 << 40, n, np.int64)
    price = (rng.standard_normal(n) * 100).astype(np.float64)
    price[5] = np.nan  # poisons exactly key[5]'s group
    pf32 = (rng.standard_normal(n) * 10).astype(np.float32)
    path = str(tmp_path / "g.flt")
    fio_table.write_table(path, {"k": key, "v": val32, "s": sval,
                                 "p": price, "q": pf32}, chunk_blocks=2)

    for col, vals in (("v", val32), ("s", sval), ("p", price), ("q", pf32)):
        got = analytics.group_stats(path, "k", col)
        assert sorted(got) == sorted(int(g) for g in np.unique(key))
        for g in np.unique(key):
            m = key == g
            r = got[int(g)]
            assert r["count"] == int(m.sum())
            sub = vals[m]
            if np.issubdtype(vals.dtype, np.integer):
                assert r["sum"] == int(sub.sum())
                assert r["min"] == int(sub.min())
                assert r["max"] == int(sub.max())
            elif np.isnan(sub).any():
                assert math.isnan(r["sum"]) and math.isnan(r["min"])
            else:
                assert r["sum"] == float(sum(Fraction(float(x))
                                             for x in sub))
                assert r["min"] == float(sub.min())
                assert r["max"] == float(sub.max())

    # explicit max_groups: groups beyond the data are simply absent
    got = analytics.group_stats(path, "k", "v", max_groups=32)
    assert sorted(got) == sorted(int(g) for g in np.unique(key))
    # float key column rejected
    with pytest.raises(ValueError, match="integer"):
        analytics.group_stats(path, "p", "v", max_groups=4)
    # mismatched layouts rejected
    path2 = str(tmp_path / "g2.flt")
    fio_table.write_table(path2, {"k": key, "v": val32[:3000]},
                          chunk_blocks=2)
    with pytest.raises(ValueError, match="mismatch|chunk"):
        analytics.group_stats(path2, "k", "v")


def test_group_stats_negative_keys_and_empty(tmp_path, rng):
    key = rng.integers(-3, 3, 2048, np.int64).astype(np.int32)
    val = rng.integers(0, 100, 2048, np.int64).astype(np.uint16)
    path = str(tmp_path / "neg.flt")
    fio_table.write_table(path, {"k": key, "v": val})
    with pytest.raises(ValueError, match=">= 0"):
        analytics.group_stats(path, "k", "v")


def test_scan_u8_and_bool_columns(tmp_path, rng):
    # u8 scans once crashed: the 16-bit plane mask overflowed uint8
    from fastlanes_tpu import analytics, fio, fio_table

    v8 = rng.integers(0, 256, 3000, np.int64).astype(np.uint8)
    path = str(tmp_path / "u8.flt")
    fio.write_file(path, v8)
    s = analytics.scan_column(path)
    assert s["sum"] == int(v8.sum())
    assert s["min"] == int(v8.min()) and s["max"] == int(v8.max())
    # bool logical column scans in the 0/1 domain (sum == true count)
    flags = rng.random(3000) < 0.3
    k = rng.integers(0, 4, 3000).astype(np.uint16)
    tpath = str(tmp_path / "b.flt")
    fio_table.write_table(tpath, {"paid": flags, "k": k})
    s = analytics.scan_column(tpath, "paid")
    assert s["sum"] == int(flags.sum())
    g = analytics.group_stats(tpath, "k", "paid")
    for gk, st in g.items():
        assert st["sum"] == int(flags[k == gk].sum())
    # signed i8 exact sums (plane reduction + two's-complement correction)
    s8 = rng.integers(-128, 128, 3000, np.int64).astype(np.int8)
    p8 = str(tmp_path / "i8.flt")
    fio.write_file(p8, s8)
    assert analytics.scan_column(p8)["sum"] == int(s8.sum())
