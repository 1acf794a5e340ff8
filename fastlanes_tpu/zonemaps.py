"""Per-chunk zone maps: min/max/null/NaN statistics for predicate skipping.

Framework extension beyond the reference crate (spiraldb/fastlanes is a
block codec library with no file format — reference macros.rs:1-9); the
design follows the FastLanes/Vortex file-format family's chunk-pruning
statistics. Writers attach an optional ``stats`` dict to each chunk's
metadata (FORMAT.md section 2); predicate scans (`analytics.count_where`,
`scan_where`, `scan_where_multi`, `select`, `join`) consult it to decide,
per chunk, whether the predicate can match NO row ("none" — the chunk is
never read or decoded), EVERY non-null row ("all" — counts resolve from
the header alone), or must be evaluated ("maybe"). Files without stats
scan every chunk, and old readers ignore the key — the format stays
two-way compatible.

Stats live in the column's COMPARISON domain, the same domain
`analytics._pred_mask` evaluates predicates in:

- integer columns <= 32 bits: the logical (post-untransform) values —
  signed for zigzag/viewu columns, the carrier reinterpretation for
  explicit-dtype columns;
- 64-bit integer columns (u64 / i64 / datetime64 / timedelta64): the
  int64 two's-complement view of the logical bits (`_hit_u64` compares
  limbs in signed-int64 order);
- float columns: float min/max over non-NaN values plus a NaN count
  (NaN matches only 'ne'; -0.0 == +0.0);
- string columns: u32 codes of the sorted dictionary (predicates are
  translated to the code domain before any zone decision).

Null rows never match a predicate, so stats cover valid rows only and
carry the chunk's null count (``nn``) when the column is nullable.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["stats_of", "decide", "kind_of", "decisions", "prep_probe"]

_SET_OPS = ("in", "notin")

# ---------------------------------------------------------------------------
# Writer side


def stats_of(vals: np.ndarray, mask, kind: str):
    """One chunk's zone stats, or None when nothing useful can be said.

    `vals` is the chunk's value slice in the comparison domain (caller
    views 64-bit columns as int64 first), WITHOUT tail padding; `mask` is
    the chunk's null-mask slice (True = null) or None. Key order is fixed
    so the streaming TableWriter stays byte-identical to write_table.
    """
    vals = np.asarray(vals).reshape(-1)
    nn = 0
    if mask is not None:
        m = np.asarray(mask, bool).reshape(-1)
        nn = int(m.sum())
        if nn:
            vals = vals[~m]
    st = {}
    if kind in ("f32", "f64"):
        isnan = np.isnan(vals)
        n_nan = int(isnan.sum())
        if n_nan:
            vals = vals[~isnan]
        if vals.size:
            st["lo"] = float(vals.min())
            st["hi"] = float(vals.max())
        if n_nan:
            st["nan"] = n_nan
    elif vals.size:
        st["lo"] = int(vals.min())
        st["hi"] = int(vals.max())
    if nn:
        st["nn"] = nn
    return st or None


# ---------------------------------------------------------------------------
# Reader side


def kind_of(cdtype: str, vtype) -> str:
    """Comparison-domain kind of a column: 'f32'/'f64' floats, 'i64' for
    64-bit integer carriers (limb compares run in int64 order), 'int'
    otherwise (natural order of the logical dtype)."""
    if vtype == "f32":
        return "f32"
    if vtype == "f64":
        return "f64"
    if cdtype == "u64":
        return "i64"
    return "int"


def prep_probe(value, kind: str):
    """Probe value -> the comparison domain, mirroring _pred_mask's host
    conversions exactly (f32 probes round through np.float32, 64-bit int
    probes wrap mod 2^64 into int64 two's complement, -0.0 -> +0.0).
    Returns None when the probe can't convert (the decode path will raise
    the proper error)."""
    try:
        if kind == "f32":
            v = float(value)
            return v if math.isnan(v) else (
                0.0 if v == 0 else float(np.float32(v)))
        if kind == "f64":
            v = float(value)
            return v if math.isnan(v) else (0.0 if v == 0 else v)
        u = int(value)
        if kind == "i64":
            u &= (1 << 64) - 1
            return u - (1 << 64) if u >= (1 << 63) else u
        return u
    except (TypeError, ValueError, OverflowError):
        return None


def _order_decide(lo, hi, v, op: str) -> str:
    """Pure order decision over a [lo, hi] range (no NaN/null concerns)."""
    if op == "lt":
        return "all" if hi < v else ("none" if lo >= v else "maybe")
    if op == "le":
        return "all" if hi <= v else ("none" if lo > v else "maybe")
    if op == "gt":
        return "all" if lo > v else ("none" if hi <= v else "maybe")
    if op == "ge":
        return "all" if lo >= v else ("none" if hi < v else "maybe")
    if op == "eq":
        if v < lo or v > hi:
            return "none"
        return "all" if lo == hi else "maybe"
    if op == "ne":
        if v < lo or v > hi:
            return "all"
        return "none" if lo == hi else "maybe"
    return "maybe"


def _member_decide(st, probes, negate: bool, is_float: bool,
                   n_nan: int) -> str:
    """IN / NOT IN decision. `probes` are prepped, NaN probes dropped
    (equality with NaN matches nothing)."""
    if "lo" not in st:  # all rows null or NaN
        if n_nan == 0:
            return "none"  # all-null: nulls match nothing, not even NOT IN
        return "all" if negate else "none"  # NaN rows fail every eq probe
    lo, hi = st["lo"], st["hi"]
    inside = [p for p in probes if lo <= p <= hi]
    single_hit = lo == hi and any(p == lo for p in probes)
    if not negate:
        if not inside:
            return "none"
        if single_hit and n_nan == 0:
            return "all"
        return "maybe"
    if not inside:
        return "all"  # NaN rows match NOT IN too (~False)
    if single_hit:
        return "none" if n_nan == 0 else "maybe"
    return "maybe"


def decide(st, op: str, value, kind: str) -> str:
    """Zone decision for one chunk: 'none' (no valid row can match the
    predicate), 'all' (every non-null row matches), 'maybe' (decode and
    evaluate). Missing stats always return 'maybe'. Semantics mirror
    analytics._pred_mask: NaN matches only 'ne' (and NOT IN), nulls match
    nothing, -0.0 == +0.0, out-of-range integer probes fold."""
    if not isinstance(st, dict):
        return "maybe"
    is_float = kind in ("f32", "f64")
    n_nan = st.get("nan", 0) if is_float else 0

    if op in _SET_OPS:
        probes = [prep_probe(p, kind) for p in value]
        if any(p is None for p in probes):
            return "maybe"
        if is_float:
            probes = [p for p in probes if not math.isnan(p)]
        return _member_decide(st, probes, op == "notin", is_float, n_nan)

    v = prep_probe(value, kind)
    if v is None:
        return "maybe"
    if is_float and math.isnan(v):  # NaN probe: full 'ne' mask, else empty
        return "all" if op == "ne" else "none"
    if "lo" not in st:  # no non-NaN valid values in the chunk
        if n_nan == 0:
            return "none"  # all-null
        return "all" if op == "ne" else "none"  # all-NaN rows: only 'ne'
    base = _order_decide(st["lo"], st["hi"], v, op)
    if not is_float or n_nan == 0:
        return base
    if op == "ne":  # NaN rows match 'ne': they can only help 'all'
        return base if base == "all" else "maybe"
    return "maybe" if base == "all" else base  # NaN rows break 'all'


def decisions(chunks, kind: str, op: str, value):
    """Per-chunk decisions for one predicate over a column's chunk list."""
    return [decide(meta.get("stats"), op, value, kind) for meta in chunks]


# ---------------------------------------------------------------------------
# Top-k / ORDER BY LIMIT bounds: a chunk's best achievable candidate key
# in analytics' total-order key domain (the _topk_chunk1/_topk_chunk2
# encodings), so ORDER BY LIMIT and top_k visit chunks best-bound-first
# and stop once the k-th candidate beats every remaining bound.


def topk_kind(cdtype: str, vtype, transform):
    """(kind, bits) of a column's top-k key domain — matches what
    analytics._chunk_top reports for its decoded flat form."""
    if vtype == "f32":
        return "f32", 32
    if vtype == "f64":
        return "f64", 64
    if cdtype == "u64":
        return "u64", 64
    bits = {"u8": 8, "u16": 16, "u32": 32}[cdtype]
    return ("i", bits) if transform in ("zigzag", "viewu") else ("u", bits)


def key_of_value(v, kind: str, bits: int, largest: bool):
    """A stats extreme -> its total-order key tuple. `largest` widens the
    float +-0.0 boundary (min/max cannot distinguish signed zeros, but the
    total order can)."""
    import struct

    if kind == "u":
        return (int(v),)
    if kind == "i":
        return (int(v) + (1 << (bits - 1)),)
    if kind == "u64":
        u = int(v) & ((1 << 64) - 1)
        return ((u >> 32) ^ 0x80000000, u & 0xFFFFFFFF)
    if kind == "f32":
        b = struct.unpack("<I", struct.pack(
            "<f", np.float32(v)))[0]
        if v == 0:
            b = 0 if largest else 0x80000000  # +0.0 above -0.0
        return ((~b & 0xFFFFFFFF) if b >> 31 else (b ^ 0x80000000),)
    b = struct.unpack("<Q", struct.pack("<d", float(v)))[0]
    if v == 0:
        b = 0 if largest else 1 << 63
    hi, lo = b >> 32, b & 0xFFFFFFFF
    if hi >> 31:
        return (~hi & 0xFFFFFFFF, ~lo & 0xFFFFFFFF)
    return (hi ^ 0x80000000, lo)


def _key_extreme(kind: str, top: bool):
    n = 2 if kind in ("u64", "f64") else 1
    return ((0xFFFFFFFF,) * n) if top else ((0,) * n)


def topk_bound(meta, kind: str, bits: int, largest: bool):
    """Best candidate key a chunk could contribute, or None when it
    cannot contribute at all (every row null). Chunks without stats get
    the unbeatable extreme (must decode); float chunks containing NaN get
    the extreme on the NaN side (NaN above +inf, -NaN below -inf in the
    IEEE total order, and stats don't record NaN signs)."""
    st = meta.get("stats")
    if not isinstance(st, dict):
        return _key_extreme(kind, largest)
    is_float = kind in ("f32", "f64")
    n_nan = st.get("nan", 0) if is_float else 0
    if n_nan:
        return _key_extreme(kind, largest)
    if "lo" not in st:
        return None  # all rows null
    return key_of_value(st["hi"] if largest else st["lo"], kind, bits,
                        largest)
