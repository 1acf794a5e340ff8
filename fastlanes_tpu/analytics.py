"""Fused analytics over compressed FLT columns: decode-into-consumer as a
library API.

The FastLanes layout exists so decoders fuse into their consumers
(reference macros.rs:5-9); on TPU the fused composition measures ~677e9
ints/s vs ~142e9 materialized (benchmarks/NOTES.md). This module turns
that into a user-facing query surface: reductions and filtered counts over
an FLT file or table column WITHOUT materializing the decoded data in HBM
— per chunk, one jit traces decode -> reduce and XLA fuses the pipeline.

    from fastlanes_tpu import analytics
    stats = analytics.scan_column("col.flt")             # sum/min/max/count
    n = analytics.count_where("col.flt", "gt", 1000)     # filtered count
    stats = analytics.scan_column("table.flt", column="price")

Works for every chunk codec (bitpack/ffor fuse fully; delta/zdelta/rle/alp
decode in-graph first) and every dtype incl. signed transforms and floats.
u64 integer columns reduce x64-FREE in the uint32 limb domain
(_stats_kernel_u64): sums are exact big-ints via 16-bit plane reduction;
min/max use int64 semantics (unsigned values >= 2^63 appear negative —
the same convention as the signed transforms). f64 columns still need x64
jax for sum/min/max (float reductions without f64 vector math would be
inexact).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import fio, fio_device
from .core import layout

_PREDS = {
    "lt": lambda x, v: x < v,
    "le": lambda x, v: x <= v,
    "gt": lambda x, v: x > v,
    "ge": lambda x, v: x >= v,
    "eq": lambda x, v: x == v,
    "ne": lambda x, v: x != v,
}


def _decoded_chunks(path: str, column: Optional[str], mesh):
    """Yield (decoded device blocks, header-ish dict) per chunk, already
    transform-applied — real values in the column's logical domain."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"FLTTAB1"):
        from . import fio_table

        if column is None:
            raise ValueError("table file: pass column=<name>")
        header = fio_table.read_table_header(path)
        col = fio_table._col_meta(header, column)
        base_off = fio.payload_base_of(path, fio_table.MAGIC)
        chunks, cdtype = col["chunks"], col["dtype"]
        transform, vtype = col.get("transform"), col.get("vtype")
        n_values = col.get("n_values")
    else:
        header = fio.read_header(path)
        chunks, cdtype = header["chunks"], header["dtype"]
        transform, vtype = header.get("transform"), header.get("vtype")
        n_values = header.get("n_values")
        base_off = fio._payload_base(path)

    seen_values = 0
    with open(path, "rb") as f:
        for meta in chunks:
            f.seek(base_off + meta["offset"])
            raw = f.read(meta["nbytes"])
            blocks = fio_device._decode_chunk_device(
                meta, raw, meta["n_blocks"], cdtype, mesh=mesh)
            blocks = fio_device._apply_transform_device(blocks, transform, cdtype)
            n_here = meta["n_blocks"] * layout.BLOCK
            valid = n_here
            if n_values is not None:
                valid = max(0, min(n_here, n_values - seen_values))
            seen_values += n_here
            yield blocks, cdtype, vtype, valid


def _flatten_logical(blocks, cdtype, vtype):
    """Device blocks -> flat logical vector for reductions.

    u64 INTEGER columns stay in the (lo, hi) uint32 plane domain (x64-free;
    the limb kernels below reduce them exactly — and the planes arrive
    straight from the decoder without an interleaving stack). f64 limb
    images bitcast to float64 when x64 jax is available; float reductions
    without f64 vector arithmetic would be inexact, so they still raise
    otherwise."""
    if isinstance(blocks, tuple) or type(blocks).__name__ == "LimbPlanes":
        lo, hi = blocks if isinstance(blocks, tuple) else (blocks.lo, blocks.hi)
        return lo.reshape(-1), hi.reshape(-1)
    arr = blocks
    if cdtype == "u64" and arr.ndim >= 2 and arr.shape[-1] == 2 and (
            arr.dtype == jnp.uint32):
        if vtype == "f64":
            if not jax.config.read("jax_enable_x64"):
                raise ValueError(
                    "analytics over f64 columns needs x64 jax "
                    "(jax.config.update('jax_enable_x64', True)); u64 "
                    "integer columns reduce x64-free in the limb domain")
            return jax.lax.bitcast_convert_type(
                arr.reshape(-1, 2), jnp.float64).reshape(-1)
        return arr.reshape(-1, 2)[..., 0], arr.reshape(-1, 2)[..., 1]
    return arr.reshape(-1)


_PIECE = 32768  # piece-sum length: 32768 * (2^16 - 1) < 2^31, no overflow


@jax.jit
def _stats_kernel(x, v):
    """Masked sum/min/max, one fused program per input shape/dtype
    (module-level jit: repeated chunks hit the cache). Tail padding
    (positions >= v) is excluded via iota masking.

    Integer sums are EXACT WITHOUT x64: the masked values bitcast to the
    unsigned domain and split into 16-bit halves summed per 32768-element
    piece (each partial < 2^31); the host reassembles the big-int total
    and corrects signed columns by 2^T * n_negative (two's complement).
    Returns (lo_sums, hi_sums, n_neg, mn, mx); float dtypes return the
    fused float total in lo_sums[0:1]."""
    n = x.shape[0]
    ok = jnp.arange(n) < v
    if jnp.issubdtype(x.dtype, jnp.floating):
        big = jnp.asarray(jnp.inf, x.dtype)
        total = jnp.sum(jnp.where(ok, x, jnp.asarray(0, x.dtype)))
        mn = jnp.min(jnp.where(ok, x, big))
        mx = jnp.max(jnp.where(ok, x, -big))
        z = jnp.zeros((1,), jnp.uint32)
        return total[None][None], z, jnp.int32(0), mn, mx
    info = jnp.iinfo(x.dtype)
    mn = jnp.min(jnp.where(ok, x, jnp.asarray(info.max, x.dtype)))
    mx = jnp.max(jnp.where(ok, x, jnp.asarray(info.min, x.dtype)))
    signed = jnp.issubdtype(x.dtype, jnp.signedinteger)
    n_neg = (jnp.sum((ok & (x < 0)).astype(jnp.int32)) if signed
             else jnp.int32(0))
    t = x.dtype.itemsize * 8
    xu = jax.lax.bitcast_convert_type(
        jnp.where(ok, x, jnp.asarray(0, x.dtype)), jnp.dtype(f"uint{t}"))
    pad = (-n) % _PIECE
    if pad:
        xu = jnp.concatenate([xu, jnp.zeros(pad, xu.dtype)])
    pieces = xu.reshape(-1, _PIECE)
    # one 16-bit plane per 16 bits of the dtype, each piece-sum < 2^31
    planes = []
    for k in range(max(2, t // 16)):
        part = ((pieces >> jnp.asarray(16 * k, xu.dtype))
                & jnp.asarray(0xFFFF, xu.dtype)).astype(jnp.uint32)
        planes.append(jnp.sum(part, axis=1, dtype=jnp.uint32))
    return jnp.stack(planes), jnp.zeros((1,), jnp.uint32), n_neg, mn, mx


@jax.jit
def _stats_kernel_u64(lo, hi, v):
    """u64 limb-domain twin of _stats_kernel, x64-free and EXACT: four
    16-bit planes summed per piece (big-int reassembly on the host), and
    min/max by signed-int64 order computed lexicographically on
    (sign-flipped hi, lo) — matching the int64 semantics of the x64 path
    (unsigned columns >= 2^63 appear negative; recovered by the caller's
    two's-complement reconstruction). Takes separate planes (the decoder's
    native output form — no interleave anywhere on the path)."""
    n = lo.shape[0]
    ok = jnp.arange(n) < v
    lo = jnp.where(ok, lo, jnp.uint32(0))
    hi = jnp.where(ok, hi, jnp.uint32(0))
    n_neg = jnp.sum(((hi >> 31) & 1).astype(jnp.int32))
    # signed order key: flip the sign bit of hi, compare (key, lo) lexicographic
    key = hi ^ jnp.uint32(0x80000000)
    big = jnp.uint32(0xFFFFFFFF)
    key_mn = jnp.where(ok, key, big)
    key_mx = jnp.where(ok, key, jnp.uint32(0))
    kmn = jnp.min(key_mn)
    kmx = jnp.max(key_mx)
    mn_lo = jnp.min(jnp.where(ok & (key == kmn), lo, big))
    mx_lo = jnp.max(jnp.where(ok & (key == kmx), lo, jnp.uint32(0)))
    # exact sum: 16-bit planes over both limbs
    pad = (-n) % _PIECE
    if pad:
        lo = jnp.concatenate([lo, jnp.zeros(pad, jnp.uint32)])
        hi = jnp.concatenate([hi, jnp.zeros(pad, jnp.uint32)])
    planes = []
    for src, base in ((lo, 0), (hi, 2)):
        pieces = src.reshape(-1, _PIECE)
        for k in range(2):
            part = (pieces >> jnp.uint32(16 * k)) & jnp.uint32(0xFFFF)
            planes.append(jnp.sum(part, axis=1, dtype=jnp.uint32))
    return jnp.stack(planes), n_neg, kmn, mn_lo, kmx, mx_lo


def _i64_of(key: int, lo: int) -> int:
    """(sign-flipped hi key, lo) -> python int with int64 semantics."""
    u = ((key ^ 0x80000000) << 32) | lo
    return u - (1 << 64) if u >= (1 << 63) else u


@functools.partial(jax.jit, static_argnames=("op",))
def _count_kernel_u64(lo, hi, v, vkey, vlo, op):
    """Filtered count on u64 limbs: signed-int64 predicate evaluated
    lexicographically on (sign-flipped hi, lo) without 64-bit ints."""
    ok = jnp.arange(lo.shape[0]) < v
    key = hi ^ jnp.uint32(0x80000000)
    lt = (key < vkey) | ((key == vkey) & (lo < vlo))
    eq = (key == vkey) & (lo == vlo)
    hit = {"lt": lt, "le": lt | eq, "gt": ~(lt | eq), "ge": ~lt,
           "eq": eq, "ne": ~eq}[op]
    return jnp.sum((ok & hit).astype(jnp.int32))


def _combine_sum(planes, _unused, n_neg, dtype_bits, is_float):
    if is_float:
        return float(planes.reshape(-1)[0])
    total = 0
    for k in range(planes.shape[0]):
        total += int(np.sum(np.asarray(planes[k], np.int64))) << (16 * k)
    return total - (int(n_neg) << dtype_bits)


class _StatAcc:
    """Running sum/min/max/count accumulator fed one decoded chunk at a
    time — the shared core of scan_column and scan_table."""

    def __init__(self):
        self.total = 0
        self.mn = None
        self.mx = None
        self.count = 0

    def feed(self, blocks, cdtype, vtype, valid):
        if valid == 0:
            return
        flat = _flatten_logical(blocks, cdtype, vtype)
        if isinstance(flat, tuple):  # u64 integer limb planes (x64-free exact)
            planes, n_neg, kmn, mn_lo, kmx, mx_lo = _stats_kernel_u64(
                flat[0], flat[1], jnp.int32(valid))
            self.total += _combine_sum(np.asarray(planes), None, int(n_neg),
                                       64, False)
            m1 = _i64_of(int(kmn), int(mn_lo))
            m2 = _i64_of(int(kmx), int(mx_lo))
        else:
            planes, _z, n_neg, m1, m2 = _stats_kernel(flat, jnp.int32(valid))
            is_float = np.issubdtype(np.asarray(m1).dtype, np.floating)
            self.total += _combine_sum(np.asarray(planes), None, int(n_neg),
                                       np.asarray(flat).dtype.itemsize * 8
                                       if not is_float else 0, is_float)
            m1, m2 = m1.item(), m2.item()
        self.mn = m1 if self.mn is None else min(self.mn, m1)
        self.mx = m2 if self.mx is None else max(self.mx, m2)
        self.count += valid

    def result(self) -> dict:
        return {"sum": self.total, "min": self.mn, "max": self.mx,
                "count": self.count}


def scan_column(path: str, column: Optional[str] = None, mesh=None) -> dict:
    """Fused sum/min/max/count over a compressed column — the decoded data
    never materializes in HBM for fusable codecs. Returns python scalars:
    {sum, min, max, count}."""
    acc = _StatAcc()
    for blocks, cdtype, vtype, valid in _decoded_chunks(path, column, mesh):
        acc.feed(blocks, cdtype, vtype, valid)
    return acc.result()


def scan_table(path: str, columns=None, mesh=None) -> dict:
    """Single-pass fused stats over several (default: all) columns of an
    FLTTAB table file: the header parses once and every selected chunk is
    visited in payload-offset order, so the file is read sequentially
    exactly once no matter how many columns are scanned — the multi-column
    analogue of Vortex-style projection pushdown over the reference's block
    codecs (reference macros.rs:5-9 fusion invariant per chunk). Returns
    {column_name: {sum, min, max, count}}."""
    from . import fio_table

    header = fio_table.read_table_header(path)
    names = list(header["columns"]) if columns is None else list(columns)
    cols = {name: fio_table._col_meta(header, name) for name in names}
    base_off = fio.payload_base_of(path, fio_table.MAGIC)

    # Global chunk walk in offset order: one sequential pass over the file.
    # Within a column, chunks were written in increasing-offset order, so
    # the per-column valid-tail bookkeeping below stays in stream order.
    work = []
    for name, col in cols.items():
        for meta in col["chunks"]:
            work.append((meta["offset"], name, meta))
    work.sort(key=lambda t: t[0])

    accs = {name: _StatAcc() for name in names}
    seen = {name: 0 for name in names}
    with open(path, "rb") as f:
        for offset, name, meta in work:
            col = cols[name]
            f.seek(base_off + offset)
            raw = f.read(meta["nbytes"])
            blocks = fio_device._decode_chunk_device(
                meta, raw, meta["n_blocks"], col["dtype"], mesh=mesh)
            blocks = fio_device._apply_transform_device(
                blocks, col.get("transform"), col["dtype"])
            n_here = meta["n_blocks"] * layout.BLOCK
            valid = n_here
            if col.get("n_values") is not None:
                valid = max(0, min(n_here, col["n_values"] - seen[name]))
            seen[name] += n_here
            accs[name].feed(blocks, col["dtype"], col.get("vtype"), valid)
    return {name: accs[name].result() for name in names}


@functools.partial(jax.jit, static_argnames=("op",))
def _count_kernel(x, v, value, op):
    ok = jnp.arange(x.shape[0]) < v
    hit = _PREDS[op](x, value.astype(x.dtype))
    # int32 is enough: per-chunk counts are < 2^31 (chunk <= blocks * 1024)
    return jnp.sum((ok & hit).astype(jnp.int32))


def count_where(path: str, op: str, value, column: Optional[str] = None,
                mesh=None) -> int:
    """Fused filtered count: predicate evaluated on decoded values
    in-graph, only the running count leaves the device."""
    if op not in _PREDS:
        raise ValueError(f"unknown predicate {op!r}; have {sorted(_PREDS)}")
    total = 0
    for blocks, cdtype, vtype, valid in _decoded_chunks(path, column, mesh):
        if valid == 0:
            continue
        flat = _flatten_logical(blocks, cdtype, vtype)
        if isinstance(flat, tuple):  # u64 integer limb planes
            u = int(value) & ((1 << 64) - 1)  # two's-complement bit pattern
            vkey = jnp.uint32(((u >> 32) ^ 0x80000000) & 0xFFFFFFFF)
            vlo = jnp.uint32(u & 0xFFFFFFFF)
            total += int(_count_kernel_u64(flat[0], flat[1], jnp.int32(valid),
                                           vkey, vlo, op))
        else:
            total += int(_count_kernel(flat, jnp.int32(valid),
                                       jnp.asarray(value), op))
    return total
