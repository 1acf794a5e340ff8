"""Persistence for Encoded batches: a minimal container format.

The packed payload is the wire format (byte-identical to the Rust crate per
block); this module only adds a self-describing envelope (codec name, dtype,
width, params) via .npz so encoded batches survive round trips to disk —
the persistence concern the reference leaves to the Vortex file format."""

from __future__ import annotations

import json

import numpy as np

from ..core import layout
from ..models.codecs import Encoded

_FORMAT_VERSION = 1


def save_encoded(path: str, enc: Encoded) -> None:
    meta = {
        "version": _FORMAT_VERSION,
        "codec": enc.codec,
        "dtype": enc.dtype,
        "width": int(enc.width),
        "n_blocks": int(enc.n_blocks),
    }
    arrays = {"payload": np.asarray(enc.payload)}
    params = enc.params or {}
    for key, val in params.items():
        if isinstance(val, (int, np.integer)):
            meta[f"param_int_{key}"] = int(val)
        elif isinstance(val, str):
            meta[f"param_str_{key}"] = val  # e.g. ALP vtype
        elif isinstance(val, tuple):
            meta[f"param_tup_{key}"] = list(val)  # e.g. ALP value shape
        else:
            arrays[f"param_arr_{key}"] = np.asarray(val)
    np.savez(path, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
             **arrays)


def load_encoded(path: str) -> Encoded:
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported format version {meta['version']}")
        params = {}
        for key in data.files:
            if key.startswith("param_arr_"):
                params[key[len("param_arr_"):]] = data[key]
        for key, val in meta.items():
            if key.startswith("param_int_"):
                params[key[len("param_int_"):]] = val
            elif key.startswith("param_str_"):
                params[key[len("param_str_"):]] = val
            elif key.startswith("param_tup_"):
                params[key[len("param_tup_"):]] = tuple(val)
        layout.check_width(meta["dtype"], meta["width"])
        return Encoded(
            codec=meta["codec"], dtype=meta["dtype"], width=meta["width"],
            n_blocks=meta["n_blocks"], payload=data["payload"],
            params=params or None,
        )
