"""FLT table container: multiple named FastLanes-compressed columns per file.

The reference crate compresses single 1024-value blocks; around it, table
storage is Vortex's job. This is that layer for this framework: a flat file
holding N named columns, each an independent chunk stream in the exact FLT
wire format (fio._encode_chunk), so per-column reads touch only that
column's bytes and decode on host (here) or device (fio_device semantics
apply per chunk).

Layout: magic FLTTAB1 | u32 header_len | header JSON | concatenated payloads
Header: {version, columns: {name: {dtype, n_blocks, n_values?, chunk_blocks,
         chunks: [...]}}} — chunk offsets are absolute within the payload
         area, so columns can be read independently and in any order.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Optional

import numpy as np

from . import fio, transforms
from .core import layout

MAGIC = b"FLTTAB1"
_VERSION = 1


def _blocks_of(arr: np.ndarray, dtype: str):
    """(blocks, n_values or None) — same padding contract as fio.write_file."""
    arr = np.ascontiguousarray(arr).astype(layout.np_dtype(dtype), copy=False)
    n_values = None
    if arr.ndim == 1:
        n_values = int(arr.size)
        pad = (-arr.size) % layout.BLOCK
        if pad:
            fill = arr[-1:] if arr.size else np.zeros(1, arr.dtype)
            arr = np.concatenate([arr, np.repeat(fill, pad)])
        arr = arr.reshape(-1, layout.BLOCK)
    if arr.ndim != 2 or arr.shape[1] != layout.BLOCK:
        raise ValueError(f"column must be flat or (B, {layout.BLOCK}), got {arr.shape}")
    return arr, n_values


def write_table(path: str, columns: Dict[str, np.ndarray], dtypes=None,
                codec: str = "auto", chunk_blocks: int = 1024) -> dict:
    """Compress named columns into one table file. `dtypes` optionally maps
    column name -> dtype (default: each array's own unsigned dtype)."""
    dtypes = dtypes or {}
    cols_meta, payloads, offset = {}, [], 0
    for name, arr in columns.items():
        arr = np.asarray(arr)
        transform = None
        if name not in dtypes and arr.dtype.kind == "i":
            arr = transforms.zigzag_encode_np(arr)  # signed -> zigzag codes
            transform = "zigzag"
        dtype = layout.canon_dtype(dtypes.get(name, arr.dtype))
        blocks, n_values = _blocks_of(arr, dtype)
        chunks = []
        for start in range(0, blocks.shape[0], chunk_blocks):
            part = blocks[start:start + chunk_blocks]
            meta, payload = fio._encode_chunk(part, dtype, codec)
            meta.update(n_blocks=len(part), offset=offset, nbytes=len(payload))
            chunks.append(meta)
            payloads.append(payload)
            offset += len(payload)
        col = {"dtype": dtype, "n_blocks": int(blocks.shape[0]),
               "chunk_blocks": chunk_blocks, "chunks": chunks}
        if n_values is not None:
            col["n_values"] = n_values
        if transform is not None:
            col["transform"] = transform
        cols_meta[name] = col

    header = {"version": _VERSION, "columns": cols_meta}
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        for payload in payloads:
            f.write(payload)
    return header


def read_table_header(path: str) -> dict:
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError("not an FLT table file")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
    if header["version"] != _VERSION:
        raise ValueError(f"unsupported FLT table version {header['version']}")
    return header


def _payload_base(path: str) -> int:
    with open(path, "rb") as f:
        f.seek(len(MAGIC))
        (hlen,) = struct.unpack("<I", f.read(4))
    return len(MAGIC) + 4 + hlen


def read_column(path: str, name: str, start: int = 0,
                stop: Optional[int] = None) -> np.ndarray:
    """Decode blocks [start, stop) of one column — touches only its covering
    chunks. Full reads of flat-written columns are trimmed to exact length."""
    header = read_table_header(path)
    try:
        col = header["columns"][name]
    except KeyError:
        raise KeyError(f"no column {name!r}; have {sorted(header['columns'])}") from None
    dtype = col["dtype"]
    n = col["n_blocks"]
    full = start == 0 and stop is None
    stop = n if stop is None else min(stop, n)
    if not 0 <= start <= stop:
        raise IndexError(f"bad block range [{start}, {stop})")
    base_off = _payload_base(path)
    cb = col["chunk_blocks"]
    out = []
    with open(path, "rb") as f:
        for ci, meta in enumerate(col["chunks"]):
            c_start = ci * cb
            c_stop = c_start + meta["n_blocks"]
            if c_stop <= start or c_start >= stop:
                continue
            f.seek(base_off + meta["offset"])
            raw = f.read(meta["nbytes"])
            blocks = fio._decode_chunk(meta, raw, meta["n_blocks"], dtype)
            out.append(blocks[max(start, c_start) - c_start:
                              min(stop, c_stop) - c_start])
    blocks = (np.concatenate(out, axis=0) if out
              else np.empty((0, layout.BLOCK), layout.np_dtype(dtype)))
    if col.get("transform") == "zigzag":
        blocks = transforms.zigzag_decode_np(blocks)
    if full and "n_values" in col:
        return blocks.reshape(-1)[:col["n_values"]]
    return blocks


def read_table(path: str, names=None) -> Dict[str, np.ndarray]:
    header = read_table_header(path)
    names = list(header["columns"]) if names is None else list(names)
    return {name: read_column(path, name) for name in names}
