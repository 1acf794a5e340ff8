"""Regression tests for the round-3 session-2 code-review findings."""

import numpy as np
import pytest

from fastlanes_tpu import analytics, fio_table


def test_writer_leading_all_null_batches_carry_forward(tmp_path):
    # finding 1: an all-null FIRST batch must not leak synthetic 0/'' into
    # the distinct set — the fill is rewritten once a real value arrives
    p = str(tmp_path / "t.flt")
    with fio_table.TableWriter(p) as w:
        w.append({"v": np.ma.MaskedArray(np.zeros(5, np.uint32),
                                         mask=np.ones(5, bool)),
                  "s": np.array([None] * 5, dtype=object)})
        w.append({"v": np.ma.MaskedArray(np.array([7, 9, 7], np.uint32),
                                         mask=np.zeros(3, bool)),
                  "s": np.array(["x", "y", "x"], dtype=object)})
    assert analytics.distinct(p, "v").tolist() == [7, 9]
    assert analytics.distinct(p, "s").tolist() == ["x", "y"]
    got = fio_table.read_column(p, "v")
    assert np.ma.getmaskarray(got)[:5].all()
    np.testing.assert_array_equal(np.ma.getdata(got)[5:], [7, 9, 7])
    # write_table agrees byte-for-byte on the same logical input
    p2 = str(tmp_path / "w.flt")
    fio_table.write_table(p2, {
        "v": np.ma.MaskedArray(np.array([0, 0, 0, 0, 0, 7, 9, 7], np.uint32),
                               mask=[True] * 5 + [False] * 3),
        "s": np.array([None] * 5 + ["x", "y", "x"], dtype=object)})
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_writer_all_null_string_column_matches_write_table(tmp_path):
    p1 = str(tmp_path / "a.flt")
    p2 = str(tmp_path / "b.flt")
    col = np.array([None] * 1500, dtype=object)
    with fio_table.TableWriter(p1) as w:
        w.append({"s": col[:700]})
        w.append({"s": col[700:]})
    fio_table.write_table(p2, {"s": col})
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_writer_rejects_float_codec_mismatch(tmp_path):
    # finding 8: the streaming writer validates like write_table
    w = fio_table.TableWriter(str(tmp_path / "t.flt"), codec="rle")
    with pytest.raises(ValueError, match="alp"):
        w.append({"f": np.ones(10, np.float32)})
    w2 = fio_table.TableWriter(str(tmp_path / "t2.flt"), codec="alp")
    with pytest.raises(ValueError, match="float codec"):
        w2.append({"s": np.array(["a", "b"])})


def test_join_left_with_empty_right(tmp_path, rng):
    # finding 2: empty right table must not crash the left join
    lp = str(tmp_path / "l.flt")
    rp = str(tmp_path / "r.flt")
    fio_table.write_table(lp, {"k": rng.integers(0, 5, 1200).astype(np.uint16),
                               "v": rng.integers(0, 9, 1200).astype(np.uint8)})
    fio_table.write_table(rp, {"k": np.empty(0, np.uint16),
                               "x": np.empty(0, np.uint32)})
    rows = analytics.join(lp, rp, on="k", how="left")
    assert len(rows["v"]) == 1200
    assert np.ma.getmaskarray(rows["x"]).all()
    rows = analytics.join(lp, rp, on="k", how="inner")
    assert len(rows["v"]) == 0


def test_topk_dataset_negative_nan_ranks_lowest(tmp_path):
    # finding 3: the dataset merge must keep IEEE total order for -NaN
    import struct

    neg_nan = struct.unpack("<d", struct.pack("<Q", 0xFFF8000000000001))[0]
    p1 = str(tmp_path / "a.flt")
    p2 = str(tmp_path / "b.flt")
    from fastlanes_tpu import fio

    fio.write_file(p1, np.array([neg_nan, 5.0] * 600, np.float64))
    fio.write_file(p2, np.array([7.0] * 1200, np.float64))
    top = analytics.top_k([p1, p2], k=2)
    assert top == [7.0, 7.0]
    bottom = analytics.top_k([p1, p2], k=1, largest=False)
    assert np.isnan(bottom[0])  # -NaN is the total-order minimum


def test_select_restores_logical_dtypes(tmp_path, rng):
    # finding 4: select/join/distinct/top_k keep bool/temporal dtypes
    n = 2000
    flags = rng.random(n) < 0.4
    ts = (np.datetime64("2026-01-01", "ns")
          + rng.integers(0, 10**9, n).astype("timedelta64[ns]"))
    p = str(tmp_path / "t.flt")
    fio_table.write_table(p, {"flags": flags, "ts": ts,
                              "k": rng.integers(0, 3, n).astype(np.uint8)})
    rows = analytics.select(p, columns=["flags", "ts"],
                            preds=[("k", "eq", 1)])
    assert rows["flags"].dtype == bool
    assert rows["ts"].dtype == np.dtype("datetime64[ns]")
    k = fio_table.read_column(p, "k")
    np.testing.assert_array_equal(rows["ts"], ts[k == 1])
    np.testing.assert_array_equal(rows["flags"], flags[k == 1])
    # ORDER BY a timestamp returns timestamps
    rows = analytics.select(p, columns=["ts"], order_by="ts", desc=True,
                            limit=3)
    np.testing.assert_array_equal(rows["ts"], np.sort(ts)[::-1][:3])
    # distinct / top_k / value_counts in the logical domain
    assert analytics.distinct(p, "flags").dtype == bool
    np.testing.assert_array_equal(analytics.distinct(p, "ts"), np.unique(ts))
    assert analytics.top_k(p, "ts", k=1) == [ts.max()]
    vc = analytics.value_counts(p, "flags")
    assert vc == {False: int((~flags).sum()), True: int(flags.sum())}
    # join gathers logical dtypes too
    rp = str(tmp_path / "d.flt")
    fio_table.write_table(rp, {"k": np.arange(3, dtype=np.uint8),
                               "active": np.array([True, False, True])})
    rows = analytics.join(p, rp, on="k", columns=["flags"])
    assert rows["active"].dtype == bool


def test_value_counts_string_cap(tmp_path, rng):
    # finding 5: the max_values cap applies to string columns too
    p = str(tmp_path / "t.flt")
    cur = np.array([f"c{i}" for i in rng.integers(0, 40, 2000)])
    fio_table.write_table(p, {"cur": cur})
    with pytest.raises(ValueError, match="exceed max_values"):
        analytics.value_counts(p, "cur", max_values=10)


def test_import_rejects_non_utf8_binary(tmp_path, rng):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from fastlanes_tpu import interop

    t = pa.table({"blob": pa.array([b"\x80\x81", b"ok"], type=pa.binary())})
    pp = str(tmp_path / "b.parquet")
    pq.write_table(t, pp)
    with pytest.raises(ValueError, match="column 'blob'.*not valid UTF-8"):
        interop.parquet_to_flt(pp, str(tmp_path / "b.flt"))
