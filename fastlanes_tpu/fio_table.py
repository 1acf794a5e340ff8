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

from . import fio
from .core import layout

MAGIC = b"FLTTAB1"
_VERSION = 1





def write_table(path: str, columns: Dict[str, np.ndarray], dtypes=None,
                codec: str = "auto", chunk_blocks: int = 1024) -> dict:
    """Compress named columns into one table file. `dtypes` optionally maps
    column name -> dtype (default: each array's own unsigned dtype)."""
    dtypes = dtypes or {}
    cols_meta, payloads, offset = {}, [], 0
    for name, arr in columns.items():
        arr = np.asarray(arr)
        transform = None
        vtype = None
        if arr.dtype.kind == "f":  # float column -> ALP (see fio.write_file)
            if name in dtypes:
                raise ValueError(f"float column {name!r} chooses its own wire dtype")
            if codec not in ("auto", "alp", "alprd"):
                raise ValueError(
                    f"float column {name!r} uses the 'alp'/'alprd' codecs, "
                    f"not {codec!r}")
            vtype = "f32" if arr.dtype == np.float32 else "f64"
            dtype = "u32" if vtype == "f32" else "u64"
            blocks, n_values = fio._pad_to_blocks_float(arr)
            encode_one = lambda part, dt=dtype: fio._encode_chunk_float(  # noqa: E731
                part, dt, codec)
        else:
            if name not in dtypes and arr.dtype.kind == "i":
                arr, transform = fio.choose_signed_transform(arr, chunk_blocks)
            dtype = layout.canon_dtype(dtypes.get(name, arr.dtype))
            blocks, n_values = fio.pad_to_blocks(arr, dtype)
            encode_one = lambda part, dt=dtype: fio._encode_chunk(part, dt, codec)  # noqa: E731
        chunks = []
        for start in range(0, blocks.shape[0], chunk_blocks):
            part = blocks[start:start + chunk_blocks]
            meta, payload = encode_one(part)
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
        if vtype is not None:
            col["vtype"] = vtype
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
    return fio.payload_base_of(path, MAGIC)


def _read_column(f, col: dict, base_off: int, start: int,
                 stop: Optional[int]) -> np.ndarray:
    dtype = col["dtype"]
    n = col["n_blocks"]
    full = start == 0 and stop is None
    stop = n if stop is None else min(stop, n)
    if not 0 <= start <= stop:
        raise IndexError(f"bad block range [{start}, {stop})")
    blocks = fio.read_chunk_range(f, col["chunks"], base_off,
                                  col["chunk_blocks"], start, stop, dtype)
    blocks = fio.apply_inverse_transform(blocks, col.get("transform"))
    if full and "n_values" in col:
        return blocks.reshape(-1)[:col["n_values"]]
    return blocks


def _col_meta(header: dict, name: str) -> dict:
    try:
        return header["columns"][name]
    except KeyError:
        raise KeyError(f"no column {name!r}; have {sorted(header['columns'])}") from None


def read_column(path: str, name: str, start: int = 0,
                stop: Optional[int] = None) -> np.ndarray:
    """Decode blocks [start, stop) of one column — touches only its covering
    chunks. Full reads of flat-written columns are trimmed to exact length."""
    header = read_table_header(path)
    col = _col_meta(header, name)
    with open(path, "rb") as f:
        return _read_column(f, col, _payload_base(path), start, stop)


def read_table(path: str, names=None) -> Dict[str, np.ndarray]:
    """Decode several (default: all) columns, parsing the header once."""
    header = read_table_header(path)
    names = list(header["columns"]) if names is None else list(names)
    base_off = _payload_base(path)
    with open(path, "rb") as f:
        return {name: _read_column(f, _col_meta(header, name), base_off, 0, None)
                for name in names}
