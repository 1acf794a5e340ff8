"""Streaming TableWriter: append batches, bounded memory, byte-identical
output to write_table of the concatenated columns."""

import numpy as np
import pytest

from fastlanes_tpu import fio_table


def _batches(columns: dict, sizes):
    """Split equal-length columns into batches of the given sizes."""
    out = []
    at = 0
    for s in sizes:
        out.append({k: v[at:at + s] for k, v in columns.items()})
        at += s
    return out


def _write_streamed(path, columns, sizes, **kw):
    with fio_table.TableWriter(path, **kw) as w:
        for batch in _batches(columns, sizes):
            w.append(batch)
    return w.header


def test_writer_byte_identical_ints_floats_strings(tmp_path, rng):
    n = 5000
    cols = {
        "qty": rng.integers(0, 1000, n).astype(np.uint32),
        "sid": rng.integers(-500, 500, n).astype(np.int32),
        "price": rng.normal(100.0, 10.0, n).astype(np.float64),
        "cur": np.array(["EUR", "GBP", "JPY", "USD"])[rng.integers(0, 4, n)],
    }
    p1 = str(tmp_path / "stream.flt")
    p2 = str(tmp_path / "whole.flt")
    _write_streamed(p1, cols, [700, 1, 2299, 2000])
    fio_table.write_table(p2, cols)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_writer_multi_chunk_spill(tmp_path, rng):
    # chunk_blocks=2 -> many chunks; batches cross chunk boundaries
    n = 9000
    cols = {"a": np.sort(rng.integers(0, 1 << 28, n).astype(np.uint32)),
            "b": rng.integers(0, 7, n).astype(np.uint16),
            # signed multi-chunk: the transform probe sees the same first
            # chunk in both writers
            "s": np.sort(rng.integers(-(1 << 27), 1 << 27, n).astype(np.int32))}
    p1 = str(tmp_path / "s.flt")
    p2 = str(tmp_path / "w.flt")
    _write_streamed(p1, cols, [3000, 3000, 3000], chunk_blocks=2)
    fio_table.write_table(p2, cols, chunk_blocks=2)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    got = fio_table.read_table(p1)
    np.testing.assert_array_equal(got["a"], cols["a"])
    np.testing.assert_array_equal(got["b"], cols["b"])


def test_writer_nullable_and_logical(tmp_path, rng):
    n = 4000
    qty = rng.integers(0, 500, n).astype(np.uint32)
    qmask = rng.random(n) < 0.25
    flags = rng.random(n) < 0.5
    ts = (np.datetime64("2026-01-01", "ns")
          + np.sort(rng.integers(0, 10**10, n)).astype("timedelta64[ns]"))
    cats = ["x", "yy", None, "zzz"]
    cur = np.array([cats[i] for i in rng.integers(0, 4, n)], dtype=object)
    cols = {"qty": np.ma.MaskedArray(qty, mask=qmask), "flags": flags,
            "ts": ts, "cur": cur}
    p1 = str(tmp_path / "s.flt")
    p2 = str(tmp_path / "w.flt")
    _write_streamed(p1, cols, [1500, 1500, 1000])
    fio_table.write_table(p2, cols)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    got = fio_table.read_table(p1)
    np.testing.assert_array_equal(np.ma.getmaskarray(got["qty"]), qmask)
    np.testing.assert_array_equal(got["flags"], flags)
    np.testing.assert_array_equal(got["ts"], ts)
    cmask = np.array([c is None for c in cur])
    np.testing.assert_array_equal(np.ma.getmaskarray(got["cur"]), cmask)


def test_writer_null_fill_carries_across_batches(tmp_path):
    # batch 2 begins with nulls: the filler must carry batch 1's last value
    # so sorted columns keep tight deltas (write_table sees the same fill)
    v = np.ma.MaskedArray(np.arange(3000, dtype=np.uint32) * 10,
                          mask=np.zeros(3000, bool))
    v.mask[1500:1510] = True
    p1 = str(tmp_path / "s.flt")
    p2 = str(tmp_path / "w.flt")
    _write_streamed(p1, {"v": v}, [1500, 1500])
    fio_table.write_table(p2, {"v": v})
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_writer_validation_errors(tmp_path, rng):
    w = fio_table.TableWriter(str(tmp_path / "t.flt"))
    w.append({"a": np.arange(10, dtype=np.uint32),
              "b": np.arange(10, dtype=np.uint32)})
    with pytest.raises(ValueError, match="all columns"):
        w.append({"a": np.arange(5, dtype=np.uint32)})
    with pytest.raises(ValueError, match="unequal lengths"):
        w.append({"a": np.arange(5, dtype=np.uint32),
                  "b": np.arange(6, dtype=np.uint32)})
    w.close()
    with pytest.raises(ValueError, match="closed"):
        w.append({"a": np.arange(5, dtype=np.uint32),
                  "b": np.arange(5, dtype=np.uint32)})


def test_writer_error_leaves_no_spill(tmp_path, rng):
    import os

    try:
        with fio_table.TableWriter(str(tmp_path / "t.flt")) as w:
            w.append({"a": np.arange(100, dtype=np.uint32)})
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not any(f.endswith(".spill") for f in os.listdir(tmp_path))
    assert not os.path.exists(tmp_path / "t.flt")


def test_writer_analytics_and_device_read(tmp_path, rng):
    from fastlanes_tpu import analytics, fio_device

    n = 6000
    cols = {
        "cur": np.array(["a", "b", "c"])[rng.integers(0, 3, n)],
        "qty": rng.integers(0, 100, n).astype(np.uint32),
    }
    path = str(tmp_path / "s.flt")
    _write_streamed(path, cols, [2048, 2048, 1904], chunk_blocks=2)
    groups = analytics.group_stats(path, "cur", "qty")
    for label, s in groups.items():
        mask = cols["cur"] == label
        assert s["sum"] == int(cols["qty"][mask].sum())
    got = np.asarray(fio_device.read_column_device(path, "qty"))
    np.testing.assert_array_equal(got, cols["qty"])
