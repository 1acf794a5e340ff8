"""Zone maps: per-chunk min/max/null/NaN stats + predicate chunk skipping.

Two invariants:
1. Every query result is IDENTICAL with and without stats (stats are an
   optimization, never a semantics change) — checked by stripping the
   stats keys out of a file's header and comparing results.
2. Chunks the stats prove irrelevant are never decoded — checked by
   spying on fio_device._decode_chunks_grouped / _decode_chunk_device.

Stats semantics mirror analytics._pred_mask exactly: NaN matches only
'ne' (and NOT IN), nulls match nothing, -0.0 == +0.0, f32 probes round
through np.float32, 64-bit integer compares run in int64 order.
"""

import json
import struct

import numpy as np
import pytest

from fastlanes_tpu import analytics as an
from fastlanes_tpu import fio, fio_device, fio_table, zonemaps

CB = 4  # chunk_blocks: small so files have many chunks
N = CB * 1024 * 6  # 6 chunks


def strip_stats(path, out_path):
    """Copy an FLT/FLTTAB file with every chunk's stats key removed —
    byte-layout of the payload is untouched (offsets are payload-relative),
    so the copy behaves exactly like a pre-zone-map file."""
    raw = open(path, "rb").read()
    magic = fio_table.MAGIC if raw.startswith(fio_table.MAGIC) else fio.MAGIC
    m = len(magic)
    (hlen,) = struct.unpack("<I", raw[m:m + 4])
    hdr = json.loads(raw[m + 4:m + 4 + hlen].decode())
    cols = (hdr["columns"].values() if "columns" in hdr else [hdr])
    found = 0
    for col in cols:
        for c in col["chunks"]:
            found += c.pop("stats", None) is not None
    nh = json.dumps(hdr).encode()
    with open(out_path, "wb") as f:
        f.write(raw[:m] + struct.pack("<I", len(nh)) + nh + raw[m + 4 + hlen:])
    return found


class DecodeSpy:
    """Counts chunks decoded through either device decode entry."""

    def __init__(self, monkeypatch):
        self.chunks = 0
        self._in_group = False  # grouped decode may fall back per chunk
        g = fio_device._decode_chunks_grouped
        s = fio_device._decode_chunk_device

        def spy_g(covering, *a, **k):
            cov = list(covering)
            self.chunks += len(cov)
            self._in_group = True
            try:
                return g(cov, *a, **k)
            finally:
                self._in_group = False

        def spy_s(meta, *a, **k):
            if not self._in_group:
                self.chunks += 1
            return s(meta, *a, **k)

        monkeypatch.setattr(fio_device, "_decode_chunks_grouped", spy_g)
        monkeypatch.setattr(fio_device, "_decode_chunk_device", spy_s)


# ---------------------------------------------------------------------------
# Writer-side stats


def test_stats_written_int_table(tmp_path):
    p = str(tmp_path / "t.flt")
    x = np.arange(N, dtype=np.int64) - 17
    hdr = fio_table.write_table(p, {"x": x}, chunk_blocks=CB)
    chunks = hdr["columns"]["x"]["chunks"]
    assert len(chunks) == 6
    for i, c in enumerate(chunks):
        st = c["stats"]
        lo, hi = i * CB * 1024 - 17, (i + 1) * CB * 1024 - 18
        assert st == {"lo": lo, "hi": hi}


def test_stats_written_float_nan_and_nulls(tmp_path):
    p = str(tmp_path / "f.flt")
    y = np.linspace(-3, 3, N).astype(np.float32)
    y[5] = np.nan
    y[100] = -np.inf
    ym = np.ma.MaskedArray(y, mask=(np.arange(N) % 7 == 0))
    hdr = fio.write_file(p, ym, chunk_blocks=CB)
    st = hdr["chunks"][0]["stats"]
    assert st["lo"] == float(-np.inf)
    assert st["nan"] == 1  # index 5 is NaN and not null (5 % 7 != 0)
    assert st["nn"] == sum(1 for i in range(CB * 1024) if i % 7 == 0)
    valid = y[: CB * 1024][np.arange(CB * 1024) % 7 != 0]
    assert st["hi"] == float(np.nanmax(valid))


def test_stats_u64_int64_order(tmp_path):
    # u64 values above 2^63 compare NEGATIVE (the limb kernels' int64
    # order); stats must live in the same order or range pruning lies
    p = str(tmp_path / "u.flt")
    u = np.array([1, 2, 2**63 + 5, 2**64 - 1], np.uint64)
    u = np.repeat(u, 1024)
    hdr = fio.write_file(p, u, codec="bitpack", chunk_blocks=CB)
    st = hdr["chunks"][0]["stats"]
    assert st["lo"] == -(2**63) + 5  # 2^63+5 viewed as int64
    assert st["hi"] == 2
    # and count_where agrees with the established int64 semantics
    assert an.count_where(p, "lt", 0) == 2048
    assert an.count_where(p, "ge", 1) == 2048


def test_stats_all_null_chunk(tmp_path):
    p = str(tmp_path / "n.flt")
    x = np.ma.MaskedArray(np.arange(N, dtype=np.uint32),
                          mask=np.arange(N) < CB * 1024)  # chunk 0 all null
    hdr = fio.write_file(p, x, chunk_blocks=CB)
    st0 = hdr["chunks"][0]["stats"]
    assert "lo" not in st0 and st0["nn"] == CB * 1024
    assert an.count_where(p, "ge", 0) == N - CB * 1024


def test_streamed_writer_stats_byte_identical(tmp_path):
    p1, p2 = str(tmp_path / "a.flt"), str(tmp_path / "b.flt")
    x = np.ma.MaskedArray(np.arange(N, dtype=np.int64) * 3,
                          mask=(np.arange(N) % 11 == 0))
    y = np.linspace(0, 1, N).astype(np.float64)
    s = np.array([f"v{i % 13}" for i in range(N)])
    fio_table.write_table(p1, {"x": x, "y": y, "s": s}, chunk_blocks=CB)
    with fio_table.TableWriter(p2, chunk_blocks=CB) as w:
        for i in range(0, N, 3000):
            w.append({"x": x[i:i + 3000], "y": y[i:i + 3000],
                      "s": s[i:i + 3000]})
    assert open(p1, "rb").read() == open(p2, "rb").read()
    hdr = fio_table.read_table_header(p1)
    assert all("stats" in c for col in hdr["columns"].values()
               for c in col["chunks"])


# ---------------------------------------------------------------------------
# Decision unit tests (the _pred_mask semantics table)


def test_decide_int_table():
    st = {"lo": 10, "hi": 20}
    assert zonemaps.decide(st, "lt", 10, "int") == "none"
    assert zonemaps.decide(st, "lt", 21, "int") == "all"
    assert zonemaps.decide(st, "lt", 15, "int") == "maybe"
    assert zonemaps.decide(st, "le", 9, "int") == "none"
    assert zonemaps.decide(st, "le", 20, "int") == "all"
    assert zonemaps.decide(st, "gt", 20, "int") == "none"
    assert zonemaps.decide(st, "gt", 9, "int") == "all"
    assert zonemaps.decide(st, "ge", 21, "int") == "none"
    assert zonemaps.decide(st, "ge", 10, "int") == "all"
    assert zonemaps.decide(st, "eq", 9, "int") == "none"
    assert zonemaps.decide(st, "eq", 15, "int") == "maybe"
    assert zonemaps.decide({"lo": 7, "hi": 7}, "eq", 7, "int") == "all"
    assert zonemaps.decide({"lo": 7, "hi": 7}, "ne", 7, "int") == "none"
    assert zonemaps.decide(st, "ne", 25, "int") == "all"
    assert zonemaps.decide(None, "eq", 5, "int") == "maybe"  # no stats


def test_decide_membership():
    st = {"lo": 10, "hi": 20}
    assert zonemaps.decide(st, "in", [1, 2, 30], "int") == "none"
    assert zonemaps.decide(st, "in", [1, 15], "int") == "maybe"
    assert zonemaps.decide(st, "notin", [1, 30], "int") == "all"
    one = {"lo": 5, "hi": 5}
    assert zonemaps.decide(one, "in", [5, 9], "int") == "all"
    assert zonemaps.decide(one, "notin", [5], "int") == "none"
    assert zonemaps.decide(one, "notin", [4], "int") == "all"


def test_decide_float_nan_rules():
    st = {"lo": 1.0, "hi": 2.0, "nan": 3}
    # NaN rows break 'all' for every op but 'ne'...
    assert zonemaps.decide(st, "ge", 0.0, "f64") == "maybe"
    assert zonemaps.decide(st, "ne", 5.0, "f64") == "all"
    # ...and break 'none' for 'ne'
    assert zonemaps.decide({"lo": 1.0, "hi": 1.0, "nan": 1},
                           "ne", 1.0, "f64") == "maybe"
    assert zonemaps.decide({"lo": 1.0, "hi": 1.0}, "ne", 1.0, "f64") == "none"
    # NaN probe: only 'ne' matches, everywhere
    assert zonemaps.decide(st, "eq", float("nan"), "f64") == "none"
    assert zonemaps.decide(st, "ne", float("nan"), "f64") == "all"
    # all-NaN chunk
    assert zonemaps.decide({"nan": 4}, "lt", 9.0, "f64") == "none"
    assert zonemaps.decide({"nan": 4}, "ne", 9.0, "f64") == "all"
    assert zonemaps.decide({"nan": 4}, "notin", [9.0], "f64") == "all"
    # out-of-range probe still prunes ('gt' everything)
    assert zonemaps.decide({"lo": 1.0, "hi": 2.0}, "gt", 0.5, "f64") == "all"
    # -0.0 == +0.0
    assert zonemaps.decide({"lo": -0.0, "hi": 0.0}, "eq", 0.0, "f64") == "all"


def test_decide_f32_probe_rounding():
    # the probe rounds through np.float32 exactly like _pred_mask does:
    # 0.1 (f64) > np.float32(0.1), so a chunk of float32 0.1s IS 'eq' 0.1
    v = float(np.float32(0.1))
    st = {"lo": v, "hi": v}
    assert zonemaps.decide(st, "eq", 0.1, "f32") == "all"
    assert zonemaps.decide(st, "eq", 0.1, "f64") == "none"


# ---------------------------------------------------------------------------
# Results identical with and without stats + skipping proof


def _mk_table(tmp_path):
    p = str(tmp_path / "t.flt")
    x = np.arange(N, dtype=np.int64) - 5000          # sorted, zigzag probe
    q = (np.arange(N) % 100).astype(np.uint32)        # uniform: no pruning
    y = np.linspace(-10, 10, N).astype(np.float64)    # sorted floats
    s = np.array([f"g{i // (N // 4):02d}" for i in range(N)])  # 4 runs
    t = (np.datetime64("2026-01-01") +
         np.arange(N).astype("timedelta64[s]"))
    fio_table.write_table(p, {"x": x, "q": q, "y": y, "s": s, "t": t},
                          chunk_blocks=CB)
    p0 = str(tmp_path / "t0.flt")
    assert strip_stats(p, p0) > 0
    return p, p0, x, q, y, s, t


QUERIES = [
    lambda p: an.count_where(p, "lt", 0, column="x"),
    lambda p: an.count_where(p, "ge", 123456789, column="x"),  # none at all
    lambda p: an.count_where(p, "ne", 7, column="x"),
    lambda p: an.count_where(p, "in", [3, 9999, -123456], column="x"),
    lambda p: an.scan_where(p, "gt", 4000, column="x"),
    lambda p: an.scan_where(p, "lt", -9.0, column="y"),
    lambda p: an.scan_where(p, "eq", "g01", column="x", where="s"),
    lambda p: an.scan_where_multi(
        p, [("x", "ge", 1000), ("x", "lt", 3000), ("q", "lt", 50)],
        column="y"),
    lambda p: an.select(p, columns=["x", "s"], preds=[("x", "lt", -4990)]),
    lambda p: an.select(p, columns=["x"], preds=[("y", "ge", 9.9)],
                        order_by="x", limit=7, desc=True),
    lambda p: an.count_where(p, "lt", np.datetime64("2026-01-01T00:10:00"),
                             column="t"),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_results_match_stats_stripped(tmp_path, qi):
    p, p0, *_ = _mk_table(tmp_path)
    a, b = QUERIES[qi](p), QUERIES[qi](p0)
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    else:
        assert a == b


def test_chunks_skipped_counts(tmp_path, monkeypatch):
    p, p0, x, q, y, s, t = _mk_table(tmp_path)
    spy = DecodeSpy(monkeypatch)
    # equality probe on sorted data: exactly one covering chunk decodes
    assert an.count_where(p, "eq", 15000, column="x") == 1
    assert spy.chunks == 1
    spy.chunks = 0
    # range fully below chunk 0's hi: 'all' chunks resolve without decode
    n_match = an.count_where(p, "lt", 0, column="x")
    assert n_match == 5000 and spy.chunks <= 1  # boundary chunk only
    spy.chunks = 0
    # no chunk can match: nothing decodes
    assert an.count_where(p, "gt", 10**9, column="x") == 0
    assert spy.chunks == 0
    spy.chunks = 0
    # scan_where on the tail: one chunk
    r = an.scan_where(p, "ge", N - 5000 - 100, column="x")
    assert r["count"] == 100 and spy.chunks == 1
    spy.chunks = 0
    # lockstep select with a narrow predicate: window trims to the
    # covering chunks for EVERY projected column (2 columns x 1 chunk)
    rows = an.select(p, columns=["x", "s"], preds=[("x", "ge", N - 5100)])
    assert len(rows["x"]) == 100 and spy.chunks == 2


def test_skipping_with_nulls_exact(tmp_path, monkeypatch):
    p = str(tmp_path / "n.flt")
    x = np.ma.MaskedArray(np.arange(N, dtype=np.uint32),
                          mask=(np.arange(N) % 3 == 0))
    fio_table.write_table(p, {"x": x}, chunk_blocks=CB)
    spy = DecodeSpy(monkeypatch)
    got = an.count_where(p, "lt", 2 * CB * 1024, column="x")
    ref = int(((np.arange(N) < 2 * CB * 1024) & (np.arange(N) % 3 != 0)).sum())
    assert got == ref  # 'all' chunks subtract their per-chunk null counts
    assert spy.chunks == 0


def test_tail_chunk_trim_with_all_shortcut(tmp_path):
    # ragged length: the final chunk is partial; 'all' must count true
    # rows, not padded slots
    p = str(tmp_path / "r.flt")
    n = CB * 1024 * 2 + 777
    x = np.arange(n, dtype=np.uint32)
    fio.write_file(p, x, chunk_blocks=CB)
    assert an.count_where(p, "ge", 0) == n
    assert an.count_where(p, "ge", CB * 1024 * 2) == 777


def test_cross_column_keep_alignment(tmp_path):
    # predicate column prunes chunks; the value column must skip the SAME
    # chunks or the lockstep walk misaligns
    p = str(tmp_path / "c.flt")
    k = np.arange(N, dtype=np.uint32)
    v = (np.arange(N) * 2).astype(np.uint32)
    fio_table.write_table(p, {"k": k, "v": v}, chunk_blocks=CB)
    r = an.scan_where(p, "ge", N - 50, column="v", where="k")
    assert r["count"] == 50
    assert r["sum"] == int(v[-50:].sum())


def test_join_pruned_left(tmp_path):
    left = str(tmp_path / "l.flt")
    right = str(tmp_path / "r.flt")
    k = (np.arange(N) % 1000).astype(np.uint32)
    x = np.arange(N, dtype=np.uint32)
    fio_table.write_table(left, {"k": k, "x": x}, chunk_blocks=CB)
    fio_table.write_table(right, {"k": np.arange(1000, dtype=np.uint32),
                                  "lab": np.arange(1000, dtype=np.uint32) * 5})
    rows = an.join(left, right, on="k", preds=[("x", "ge", N - 10)])
    assert len(rows["x"]) == 10
    np.testing.assert_array_equal(np.sort(rows["lab"]),
                                  np.sort(k[-10:] * 5))


def test_signed_zigzag_domain(tmp_path):
    # zigzag carrier order is NOT value order; stats must use the logical
    # signed domain or pruning would be wrong near zero
    p = str(tmp_path / "z.flt")
    x = np.concatenate([np.full(CB * 1024, -5, np.int32),
                        np.full(CB * 1024, 4, np.int32)])
    hdr = fio.write_file(p, x, chunk_blocks=CB)
    assert hdr.get("transform") in ("zigzag", "viewu")
    assert hdr["chunks"][0]["stats"] == {"lo": -5, "hi": -5}
    assert an.count_where(p, "lt", 0) == CB * 1024
    assert an.count_where(p, "ge", -5) == 2 * CB * 1024


def test_bool_and_dataset_paths(tmp_path):
    p1, p2 = str(tmp_path / "b1.flt"), str(tmp_path / "b2.flt")
    b1 = np.zeros(N, bool)
    b2 = np.ones(N, bool)
    fio_table.write_table(p1, {"b": b1}, chunk_blocks=CB)
    fio_table.write_table(p2, {"b": b2}, chunk_blocks=CB)
    assert an.count_where([p1, p2], "eq", True, column="b") == N
    assert an.count_where([p1, p2], "eq", False, column="b") == N


# ---------------------------------------------------------------------------
# top_k / ORDER BY LIMIT bound pruning


def test_topk_bound_pruning_counts(tmp_path, monkeypatch):
    p = str(tmp_path / "t.flt")
    x = np.arange(N, dtype=np.uint32)
    fio_table.write_table(p, {"x": x}, chunk_blocks=CB)
    spy = DecodeSpy(monkeypatch)
    assert an.top_k(p, "x", k=5) == [N - 1 - i for i in range(5)]
    assert spy.chunks == 1  # only the best-bound chunk decodes
    spy.chunks = 0
    assert an.top_k(p, "x", k=5, largest=False) == [0, 1, 2, 3, 4]
    assert spy.chunks == 1


def test_topk_matches_stripped(tmp_path):
    p, p0, x, q, y, s, t = _mk_table(tmp_path)
    for col, kw in [("x", {}), ("x", {"largest": False}), ("y", {}),
                    ("q", {}), ("s", {}), ("t", {"largest": False})]:
        a = an.top_k(p, col, k=9, **kw)
        b = an.top_k(p0, col, k=9, **kw)
        assert a == b, (col, kw, a, b)


def test_topk_float_nan_chunks(tmp_path):
    # NaN ranks above +inf in the total order; a NaN-bearing chunk must
    # never be pruned out of a largest-k
    p = str(tmp_path / "f.flt")
    y = np.linspace(0, 1, N).astype(np.float64)
    y[3] = np.nan  # lives in chunk 0, whose finite hi is tiny
    fio.write_file(p, y, chunk_blocks=CB)
    top = an.top_k(p, k=3)
    assert np.isnan(top[0]) and top[1] == 1.0


def test_order_by_limit_pruned_matches(tmp_path, monkeypatch):
    p, p0, x, q, y, s, t = _mk_table(tmp_path)
    for kw in [dict(order_by="x", desc=True), dict(order_by="x"),
               dict(order_by="y", desc=True), dict(order_by="s"),
               dict(order_by="t", desc=True)]:
        a = an.select(p, columns=["x", "s"], limit=6, **kw)
        b = an.select(p0, columns=["x", "s"], limit=6, **kw)
        for n in a:
            np.testing.assert_array_equal(np.asarray(a[n]),
                                          np.asarray(b[n]))
    # and with a predicate on another column
    a = an.select(p, columns=["x"], preds=[("q", "lt", 50)],
                  order_by="x", desc=True, limit=4)
    b = an.select(p0, columns=["x"], preds=[("q", "lt", 50)],
                  order_by="x", desc=True, limit=4)
    np.testing.assert_array_equal(a["x"], b["x"])
    spy = DecodeSpy(monkeypatch)
    r = an.select(p, columns=["x"], order_by="x", desc=True, limit=3)
    np.testing.assert_array_equal(r["x"], np.sort(x)[::-1][:3])
    assert spy.chunks <= 2 * CB  # one window of chunks, not the file


def test_order_by_ties_stable_vs_sequential(tmp_path):
    # constant order keys: every row ties; the pruned walk must return
    # exactly the rows the sequential walk returns
    p = str(tmp_path / "c.flt")
    x = np.arange(N, dtype=np.uint32)
    const = np.zeros(N, np.uint32)
    fio_table.write_table(p, {"x": x, "c": const}, chunk_blocks=CB)
    p0 = str(tmp_path / "c0.flt")
    strip_stats(p, p0)
    a = an.select(p, columns=["x"], order_by="c", limit=10)
    b = an.select(p0, columns=["x"], order_by="c", limit=10)
    np.testing.assert_array_equal(a["x"], b["x"])
    a = an.select(p, columns=["x"], order_by="c", desc=True, limit=10)
    b = an.select(p0, columns=["x"], order_by="c", desc=True, limit=10)
    np.testing.assert_array_equal(a["x"], b["x"])


def test_order_by_nullable_key(tmp_path):
    p = str(tmp_path / "n.flt")
    x = np.ma.MaskedArray(np.arange(N, dtype=np.uint32),
                          mask=(np.arange(N) >= N - 3))  # best keys null
    fio_table.write_table(p, {"x": x}, chunk_blocks=CB)
    r = an.select(p, columns=["x"], order_by="x", desc=True, limit=5)
    np.testing.assert_array_equal(np.asarray(r["x"]),
                                  [N - 4 - i for i in range(5)])


def test_quantile_header_summary_matches(tmp_path, monkeypatch):
    p, p0, x, q, y, s, t = _mk_table(tmp_path)
    for col, qq in [("x", 0.5), ("x", [0.1, 0.9]), ("y", 0.25),
                    ("q", 0.5), ("t", 0.75)]:
        assert an.quantile(p, col, qq) == an.quantile(p0, col, qq), (col, qq)
    # the summary comes from headers and the search prunes: far fewer
    # chunks decode than the 6-chunk column times ~22 search steps
    spy = DecodeSpy(monkeypatch)
    m = an.median(p, "x")
    assert m == int(np.median(x) - 0.5) or m == int(np.median(x))
    assert spy.chunks <= 20, spy.chunks  # no full scan, pruned probes
    # (an unpruned search would decode ~6 chunks x ~15 steps + a full scan)


def test_quantile_nan_and_nullable_fast_path(tmp_path):
    pn = str(tmp_path / "nan.flt")
    y = np.linspace(0, 1, N)
    y[7] = np.nan
    fio.write_file(pn, y, chunk_blocks=CB)
    assert np.isnan(an.quantile(pn, q=0.5))
    pm = str(tmp_path / "null.flt")
    xm = np.ma.MaskedArray(np.arange(N, dtype=np.uint32),
                           mask=(np.arange(N) % 2 == 0))
    fio.write_file(pm, xm, chunk_blocks=CB)
    vals = np.arange(N)[np.arange(N) % 2 == 1]
    assert an.quantile(pm, q=0.5) == int(np.percentile(
        vals, 50, method="lower"))


def test_group_stats_where(tmp_path, monkeypatch):
    p = str(tmp_path / "g.flt")
    n = N
    rng = np.random.default_rng(5)
    k = (np.arange(n) % 4).astype(np.uint8)
    v = rng.integers(0, 1000, n).astype(np.uint32)
    flag = np.arange(n, dtype=np.uint32)  # sorted -> prunable predicate
    s = np.array(["a", "b"])[np.arange(n) % 2]
    fio_table.write_table(p, {"k": k, "v": v, "flag": flag, "s": s},
                          chunk_blocks=CB)
    # numeric predicate
    r = an.group_stats(p, "k", "v", preds=[("flag", "lt", 1000)])
    m = flag < 1000
    for g in range(4):
        gm = m & (k == g)
        assert r[g]["count"] == int(gm.sum())
        assert r[g]["sum"] == int(v[gm].sum())
        assert r[g]["min"] == int(v[gm].min())
    # string predicate + string key
    r = an.group_stats(p, "s", "v", preds=[("flag", "ge", n - 2000)])
    m = flag >= n - 2000
    for g in ("a", "b"):
        gm = m & (s == g)
        assert r[g]["count"] == int(gm.sum())
        assert r[g]["sum"] == int(v[gm].sum())
    # pruning: the predicate covers one chunk's range -> few decodes
    spy = DecodeSpy(monkeypatch)
    r = an.group_stats(p, "k", "v", max_groups=4,
                       preds=[("flag", "lt", 100)])
    assert sum(r[g]["count"] for g in r) == 100
    assert spy.chunks <= 3 * CB  # one window x three columns, not the file
    # no preds: unchanged semantics
    r0 = an.group_stats(p, "k", "v")
    for g in range(4):
        gm = k == g
        assert r0[g]["count"] == int(gm.sum())
        assert r0[g]["sum"] == int(v[gm].sum())


def test_group_stats_where_float_and_nullable(tmp_path):
    p = str(tmp_path / "gf.flt")
    n = N
    kk = (np.arange(n) % 3).astype(np.uint8)
    y = np.linspace(-1, 1, n).astype(np.float64)
    vm = np.ma.MaskedArray(np.arange(n, dtype=np.uint32),
                           mask=(np.arange(n) % 7 == 0))
    fio_table.write_table(p, {"k": kk, "y": y, "vm": vm}, chunk_blocks=CB)
    r = an.group_stats(p, "k", "y", preds=[("y", "ge", 0.5)])
    m = y >= 0.5
    for g in range(3):
        gm = m & (kk == g)
        assert r[g]["count"] == int(gm.sum())
        assert r[g]["min"] == float(y[gm].min())
    # nullable value column: null rows leave groups, preds compose
    r = an.group_stats(p, "k", "vm", preds=[("y", "lt", 0.0)])
    mv = (y < 0.0) & ~vm.mask
    for g in range(3):
        gm = mv & (kk == g)
        assert r[g]["count"] == int(gm.sum())
        assert r[g]["sum"] == int(np.asarray(vm.data)[gm].sum())


def test_recompress_preserves_stats(tmp_path):
    from fastlanes_tpu import cli

    p = str(tmp_path / "t.flt")
    x = np.arange(N, dtype=np.uint32)
    fio_table.write_table(p, {"x": x}, chunk_blocks=CB)
    out = str(tmp_path / "out.flt")
    cli.main(["recompress", p, out])
    hdr = fio_table.read_table_header(out)
    assert all("stats" in c for c in hdr["columns"]["x"]["chunks"])
