"""distinct / value_counts / top_k pushdowns over compressed columns
(metadata-only for dict/rle/string chunks; device top-k in total-order key
domains; beyond the integer-only Rust reference crate)."""

import collections
import json

import numpy as np
import pytest

from fastlanes_tpu import analytics, cli, fio, fio_table


def _mixed_codec_column(rng):
    """Three 1024-block... three chunks with different winning codecs:
    sorted (delta), categorical (dict), run-heavy (rle)."""
    sorted_part = np.sort(rng.integers(0, 1 << 20, 2048, np.int64)).astype(np.uint32)
    cats = rng.choice(1 << 20, 9, replace=False).astype(np.uint32)
    cat_part = cats[rng.integers(0, 9, 2048)]
    run_part = np.repeat(
        rng.integers(0, 1 << 20, 32, np.int64).astype(np.uint32), 64)
    return np.concatenate([sorted_part, cat_part, run_part])


def test_distinct_mixed_codecs(tmp_path, rng):
    path = str(tmp_path / "m.flt")
    values = _mixed_codec_column(rng)
    header = fio.write_file(path, values, chunk_blocks=2)
    assert len({c["codec"] for c in header["chunks"]}) >= 2  # really mixed
    np.testing.assert_array_equal(analytics.distinct(path),
                                  np.unique(values))


def test_value_counts_exact(tmp_path, rng):
    path = str(tmp_path / "v.flt")
    cats = np.array([7, 1000, 123456, 3], np.uint32)
    values = cats[rng.integers(0, 4, 5000)]
    fio.write_file(path, values)
    got = analytics.value_counts(path)
    want = dict(zip(*np.unique(values, return_counts=True)))
    assert got == {int(k): int(v) for k, v in want.items()}


def test_value_counts_padding_not_counted(tmp_path, rng):
    path = str(tmp_path / "p.flt")
    # flat length NOT a multiple of 1024: the tail block pads by repeating
    # the final value — counts must not include the padding copies
    values = np.array([5, 9] * 700, np.uint32)[:1300]
    fio.write_file(path, values)
    got = analytics.value_counts(path)
    assert got == {5: 650, 9: 650}
    # ... and top_k must not report padded duplicates beyond the true count
    assert analytics.top_k(path, k=3) == [9, 9, 9]
    assert analytics.count_where(path, "eq", 9) == 650


def test_top_k_u32_and_signed(tmp_path, rng):
    path = str(tmp_path / "t.flt")
    values = rng.integers(0, 1 << 30, 4000, np.int64).astype(np.uint32)
    fio.write_file(path, values)
    want = np.sort(values)[::-1][:7].tolist()
    assert analytics.top_k(path, k=7) == want
    assert analytics.top_k(path, k=5, largest=False) == np.sort(values)[:5].tolist()
    # signed column (file-level transform applies before the key domain)
    path2 = str(tmp_path / "s.flt")
    sv = rng.integers(-(1 << 20), 1 << 20, 3000, np.int64).astype(np.int32)
    fio.write_file(path2, sv)
    assert analytics.top_k(path2, k=4) == np.sort(sv)[::-1][:4].tolist()
    assert analytics.top_k(path2, k=4, largest=False) == np.sort(sv)[:4].tolist()


def test_top_k_u64_int64_semantics(tmp_path, rng):
    path = str(tmp_path / "t64.flt")
    values = rng.integers(0, 1 << 45, 2500, np.int64).astype(np.uint64)
    fio.write_file(path, values, dtype="u64")
    want = np.sort(values)[::-1][:6].astype(np.int64).tolist()
    assert analytics.top_k(path, k=6) == want
    with pytest.raises(ValueError, match="64-bit"):
        analytics.value_counts(path)


def test_top_k_floats(tmp_path, rng):
    for dt in (np.float32, np.float64):
        path = str(tmp_path / f"f{np.dtype(dt).itemsize}.flt")
        values = rng.normal(0, 100.0, 3000).astype(dt)
        fio.write_file(path, values)
        got = analytics.top_k(path, k=5)
        np.testing.assert_array_equal(np.asarray(got, dt),
                                      np.sort(values)[::-1][:5])
        got = analytics.top_k(path, k=5, largest=False)
        np.testing.assert_array_equal(np.asarray(got, dt),
                                      np.sort(values)[:5])
        np.testing.assert_array_equal(analytics.distinct(path),
                                      np.unique(values))
        with pytest.raises(ValueError, match="float"):
            analytics.value_counts(path)


def test_pushdowns_string_column(tmp_path, rng):
    path = str(tmp_path / "s.flt")
    cats = np.array(["alpha", "beta", "gamma", "delta"])
    cur = cats[rng.integers(0, 4, 4000)]
    fio_table.write_table(path, {"cur": cur, "x": np.arange(4000, dtype=np.uint32)})
    np.testing.assert_array_equal(analytics.distinct(path, "cur"),
                                  np.unique(cur))
    want = collections.Counter(cur.tolist())
    assert analytics.value_counts(path, "cur") == dict(want)
    assert analytics.top_k(path, "cur", k=2) == ["gamma", "gamma"]
    assert analytics.top_k(path, "cur", k=1, largest=False) == ["alpha"]


def test_distinct_u64_and_table_column(tmp_path, rng):
    path = str(tmp_path / "t.flt")
    vals64 = (np.array([3, 9, 3, 9, 27], np.uint64) << np.uint64(40))
    fio_table.write_table(path, {"big": np.tile(vals64, 300),
                                 "small": np.tile(np.arange(5, dtype=np.uint16), 300)})
    np.testing.assert_array_equal(analytics.distinct(path, "big"),
                                  np.unique(vals64))
    assert analytics.value_counts(path, "small") == {i: 300 for i in range(5)}


def test_cli_scan_pushdown_flags(tmp_path, rng, capsys):
    path = str(tmp_path / "c.flt")
    cats = np.array([4, 17, 300], np.uint32)
    values = cats[rng.integers(0, 3, 3000)]
    fio.write_file(path, values)
    assert cli.main(["scan", path, "--top", "3", "--bottom", "2",
                     "--distinct", "--value-counts"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["top"] == [300, 300, 300]
    assert out["bottom"] == [4, 4]
    assert out["n_distinct"] == 3 and out["distinct"] == [4, 17, 300]
    want = dict(zip(*np.unique(values, return_counts=True)))
    assert out["value_counts"] == {str(k): int(v) for k, v in want.items()}
