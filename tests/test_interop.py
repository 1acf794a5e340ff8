"""Arrow/Parquet/pandas/CSV interop + bool/temporal logical column types.
Everything routes through Arrow; the core library works without pyarrow
(tests here skip if it's absent)."""

import numpy as np
import pytest

from fastlanes_tpu import fio_table


def test_bool_and_datetime_columns_roundtrip(tmp_path, rng):
    # no pyarrow needed: logical types live in the FLT format itself
    n = 3000
    path = str(tmp_path / "t.flt")
    flags = rng.random(n) < 0.5
    ts = (np.datetime64("2026-01-01", "ns")
          + rng.integers(0, 10**9, n).astype("timedelta64[ns]"))
    ts.sort()
    dur = rng.integers(-1000, 1000, n).astype("timedelta64[ms]")
    header = fio_table.write_table(path, {"flags": flags, "ts": ts,
                                          "dur": dur})
    assert header["columns"]["flags"]["vtype"] == "bool"
    assert header["columns"]["ts"]["vtype"] == "datetime64[ns]"
    got = fio_table.read_table(path)
    assert got["flags"].dtype == bool
    np.testing.assert_array_equal(got["flags"], flags)
    assert got["ts"].dtype == ts.dtype
    np.testing.assert_array_equal(got["ts"], ts)
    np.testing.assert_array_equal(got["dur"], dur)
    # sorted timestamps delta-compress far below their 8 B/value raw
    ts_col = header["columns"]["ts"]
    payload = sum(c["nbytes"] for c in ts_col["chunks"])
    assert payload < ts.nbytes / 2


def test_nullable_bool_datetime(tmp_path, rng):
    n = 2000
    path = str(tmp_path / "t.flt")
    flags = rng.random(n) < 0.5
    fmask = rng.random(n) < 0.3
    ts = (np.datetime64("2026-01-01", "s")
          + rng.integers(0, 10**6, n).astype("timedelta64[s]")).astype(
              "datetime64[ns]")
    tmask = rng.random(n) < 0.3
    fio_table.write_table(path, {
        "flags": np.ma.MaskedArray(flags, mask=fmask),
        "ts": np.ma.MaskedArray(ts, mask=tmask)})
    got = fio_table.read_table(path)
    np.testing.assert_array_equal(np.ma.getmaskarray(got["flags"]), fmask)
    np.testing.assert_array_equal(np.ma.getdata(got["flags"])[~fmask],
                                  flags[~fmask])
    np.testing.assert_array_equal(np.ma.getmaskarray(got["ts"]), tmask)
    np.testing.assert_array_equal(np.ma.getdata(got["ts"])[~tmask],
                                  ts[~tmask])


@pytest.fixture
def pa():
    return pytest.importorskip("pyarrow")


def _sample_arrow_table(pa, rng, n=3000):
    ints = rng.integers(-(1 << 20), 1 << 20, n)
    imask = rng.random(n) < 0.2
    price = rng.normal(100.0, 5.0, n)
    pmask = rng.random(n) < 0.1
    cur = np.array(["EUR", "GBP", "JPY", "USD"])[rng.integers(0, 4, n)]
    cmask = rng.random(n) < 0.15
    ts = (np.datetime64("2026-01-01", "ns")
          + rng.integers(0, 10**12, n).astype("timedelta64[ns]"))
    return pa.table({
        "sid": pa.array(ints.astype(np.int32), mask=imask),
        "big": pa.array(rng.integers(0, 1 << 45, n).astype(np.uint64)),
        "price": pa.array(price, mask=pmask),
        "cur": pa.array([None if m else str(c)
                         for c, m in zip(cur, cmask)], type=pa.string()),
        "flag": pa.array((ints % 2 == 0)),
        "ts": pa.array(ts),
    })


def test_parquet_roundtrip(tmp_path, rng, pa):
    import pyarrow.parquet as pq

    from fastlanes_tpu import interop

    src = _sample_arrow_table(pa, rng)
    ppath = str(tmp_path / "src.parquet")
    pq.write_table(src, ppath)
    fpath = str(tmp_path / "t.flt")
    interop.parquet_to_flt(ppath, fpath)
    # 1) host reads agree with the Arrow source
    got = fio_table.read_table(fpath)
    for name in src.column_names:
        want = interop._arrow_array_to_numpy(src.column(name))
        g = got[name]
        if isinstance(want, np.ma.MaskedArray):
            np.testing.assert_array_equal(np.ma.getmaskarray(g),
                                          np.ma.getmaskarray(want))
            ok = ~np.ma.getmaskarray(want)
            np.testing.assert_array_equal(np.asarray(np.ma.getdata(g))[ok],
                                          np.ma.getdata(want)[ok])
        elif want.dtype == object:  # string column with nulls
            mask = np.array([v is None for v in want])
            np.testing.assert_array_equal(np.ma.getmaskarray(g), mask)
        else:
            np.testing.assert_array_equal(np.asarray(g), want)
    # 2) export back to parquet: values and nulls survive
    out = str(tmp_path / "back.parquet")
    interop.flt_to_parquet(fpath, out)
    back = pq.read_table(out)
    for name in src.column_names:
        assert back.column(name).null_count == src.column(name).null_count
        b = interop._arrow_array_to_numpy(back.column(name))
        w = interop._arrow_array_to_numpy(src.column(name))
        if isinstance(w, np.ma.MaskedArray):
            ok = ~np.ma.getmaskarray(w)
            np.testing.assert_array_equal(np.ma.getdata(b)[ok],
                                          np.ma.getdata(w)[ok])
        else:
            np.testing.assert_array_equal(np.asarray(b), np.asarray(w))


def test_pandas_roundtrip(tmp_path, rng, pa):
    pd = pytest.importorskip("pandas")

    from fastlanes_tpu import interop

    n = 2500
    df = pd.DataFrame({
        "qty": rng.integers(0, 1000, n).astype(np.uint32),
        "price": rng.normal(10.0, 1.0, n),
        "cur": np.array(["a", "bb", "ccc"])[rng.integers(0, 3, n)],
        "when": pd.to_datetime(
            rng.integers(0, 10**9, n), unit="s"),
    })
    path = str(tmp_path / "t.flt")
    interop.write_table_from_pandas(path, df)
    back = interop.read_table_to_pandas(path)
    np.testing.assert_array_equal(back["qty"].to_numpy(), df["qty"].to_numpy())
    np.testing.assert_array_equal(back["price"].to_numpy(),
                                  df["price"].to_numpy())
    assert back["cur"].tolist() == df["cur"].tolist()
    np.testing.assert_array_equal(back["when"].to_numpy(),
                                  df["when"].to_numpy())


def test_csv_import_and_analytics(tmp_path, rng, pa):
    from fastlanes_tpu import analytics, interop

    n = 2000
    qty = rng.integers(0, 500, n)
    cur = np.array(["EUR", "USD"])[rng.integers(0, 2, n)]
    csv_path = str(tmp_path / "d.csv")
    with open(csv_path, "w") as f:
        f.write("qty,cur\n")
        for q, c in zip(qty, cur):
            f.write(f"{q},{c}\n")
    path = str(tmp_path / "t.flt")
    interop.csv_to_flt(csv_path, path)
    s = analytics.scan_where(path, "eq", "EUR", column="qty", where="cur")
    mask = cur == "EUR"
    assert s["count"] == int(mask.sum())
    assert s["sum"] == int(qty[mask].sum())


def test_cli_import_export(tmp_path, rng, pa, capsys):
    import json

    import pyarrow.parquet as pq

    from fastlanes_tpu import cli, interop

    src = _sample_arrow_table(pa, rng, n=1500)
    ppath = str(tmp_path / "s.parquet")
    pq.write_table(src, ppath)
    fpath = str(tmp_path / "t.flt")
    assert cli.main(["import", ppath, fpath]) == 0
    info = json.loads(capsys.readouterr().out)
    assert set(info["columns"]) == set(src.column_names)
    out = str(tmp_path / "o.parquet")
    assert cli.main(["export", fpath, out]) == 0
    back = pq.read_table(out)
    w = interop._arrow_array_to_numpy(src.column("big"))
    np.testing.assert_array_equal(
        np.asarray(interop._arrow_array_to_numpy(back.column("big"))), w)


def test_parquet_streaming_import_byte_identical(tmp_path, rng, pa):
    import pyarrow.parquet as pq

    from fastlanes_tpu import interop

    src = _sample_arrow_table(pa, rng, n=5000)
    ppath = str(tmp_path / "s.parquet")
    pq.write_table(src, ppath, row_group_size=1000)
    p1 = str(tmp_path / "whole.flt")
    p2 = str(tmp_path / "stream.flt")
    interop.parquet_to_flt(ppath, p1)
    interop.parquet_to_flt(ppath, p2, batch_rows=700)
    assert open(p1, "rb").read() == open(p2, "rb").read()
