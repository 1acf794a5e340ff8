"""Device-side FLT reads: host IO ships only compressed bytes; the chip
decodes.

The TPU-native IO story the host-only `fio` module cannot tell: for a
width-W u32 column only W/32 of the raw bytes cross PCIe/host memory — the
Pallas/XLA decode kernels expand to full values directly in HBM, optionally
sharded over a `jax.sharding.Mesh` (each device decodes its shard of blocks,
collective-free; reference has no IO layer — this is new surface mandated by
the north star, composing fio's chunk format with ops/kernels/parallel).

u64 columns are returned as (..., 2) uint32 limb images (lo, hi) — the exact
byte image of the u64 buffer — unless jax x64 is enabled by the caller.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import fio, transforms
from .core import layout
from .kernels import pallas_codecs as pk
from .ops import delta as delta_mod
from .ops import transpose as transpose_mod
from .parallel import shard as psh


def _np_to_device_form(arr: np.ndarray, dtype: str):
    """Host buffer -> engine-friendly array: u64 becomes (..., 2) uint32."""
    if dtype == "u64":
        limbs = arr.view(np.uint32).reshape(*arr.shape, 2)
        return jnp.asarray(limbs)
    return jnp.asarray(arr)


def _unzigzag_device(codes, dtype: str):
    """Zigzag codes -> two's-complement bits, in the wire's unsigned domain.
    v = (u >> 1) ^ -(u & 1); for u64 limb images -(u & 1) is all-ones or
    zero in BOTH limbs, so it stays pure 32-bit vector math."""
    import jax

    if dtype == "u64":
        lo, hi = codes[..., 0], codes[..., 1]
        s_lo = (lo >> 1) | (hi << 31)
        s_hi = hi >> 1
        m = jnp.uint32(0) - (lo & jnp.uint32(1))
        return jnp.stack([s_lo ^ m, s_hi ^ m], axis=-1)
    t = layout.bit_width(dtype)
    return jax.lax.bitcast_convert_type(
        transforms.zigzag_decode(codes), jnp.dtype(f"uint{t}"))


def _decode_chunk_device(meta: dict, raw: bytes, n_blocks: int, dtype: str,
                         mesh=None, use_kernels: bool = True):
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    np_dt = layout.np_dtype(dtype)
    w = meta["width"]
    codec = meta["codec"]
    plen = layout.packed_len(dtype, w)

    if codec in ("delta", "zdelta"):
        base_bytes = n_blocks * nl * np_dt.itemsize
        base = _np_to_device_form(
            np.frombuffer(raw[:base_bytes], np_dt).reshape(n_blocks, nl), dtype)
        packed = _np_to_device_form(
            np.frombuffer(raw[base_bytes:], np_dt).reshape(n_blocks, plen), dtype)
        if codec == "zdelta":
            if mesh is not None:
                # unpack -> unzigzag -> prefix-sum composed in-graph per shard
                zz = psh.sharded_unpack(mesh, packed, w, dtype,
                                        use_kernels=use_kernels)
                deltas = _unzigzag_device(zz, dtype)
                transposed = delta_mod.undelta(deltas, base, dtype)
            else:
                # single fused kernel pass
                transposed = pk.unzdelta_pack(packed, base, w, dtype)
        elif mesh is not None:
            transposed = psh.sharded_undelta_pack(mesh, packed, base, w, dtype,
                                                  use_kernels=use_kernels)
        else:
            transposed = pk.undelta_pack(packed, base, w, dtype)
        # untranspose is a static permutation — XLA lowers it as a copy
        return transpose_mod.untranspose(transposed, dtype)

    packed = _np_to_device_form(np.frombuffer(raw, np_dt).reshape(n_blocks, plen), dtype)
    if codec == "bitpack":
        if mesh is not None:
            return psh.sharded_unpack(mesh, packed, w, dtype, use_kernels=use_kernels)
        return pk.unpack(packed, w, dtype)
    if codec == "ffor":
        ref_val = meta["reference"]
        if mesh is not None:
            return psh.sharded_unfor_pack(mesh, packed, ref_val, w, dtype,
                                          use_kernels=use_kernels)
        return pk.unfor_pack(packed, ref_val, w, dtype)
    raise ValueError(f"unknown codec {codec!r}")


def read_blocks_device(path: str, start: int = 0, stop: Optional[int] = None,
                       mesh=None, use_kernels: bool = True):
    """Decode blocks [start, stop) of an FLT file on the accelerator.

    Returns a jax array of shape (stop-start, 1024) ((..., 2) uint32 for
    u64). With `mesh`, each chunk's decode is shard_mapped over the block
    axis — multi-chip decode of one file."""
    header = fio.read_header(path)
    dtype = header["dtype"]
    n = header["n_blocks"]
    stop = n if stop is None else min(stop, n)
    if not 0 <= start <= stop:
        raise IndexError(f"bad block range [{start}, {stop})")
    base_off = fio._payload_base(path)
    cb = header["chunk_blocks"]
    out = []
    with open(path, "rb") as f:
        for ci, meta in enumerate(header["chunks"]):
            c_start = ci * cb
            c_stop = c_start + meta["n_blocks"]
            if c_stop <= start or c_start >= stop:
                continue
            f.seek(base_off + meta["offset"])
            raw = f.read(meta["nbytes"])
            blocks = _decode_chunk_device(meta, raw, meta["n_blocks"], dtype,
                                          mesh=mesh, use_kernels=use_kernels)
            lo = max(start, c_start) - c_start
            hi = min(stop, c_stop) - c_start
            out.append(blocks[lo:hi])
    if not out:
        shape = (0, layout.BLOCK, 2) if dtype == "u64" else (0, layout.BLOCK)
        blocks = jnp.zeros(shape, jnp.uint32 if dtype == "u64"
                           else layout.np_dtype(dtype))
    else:
        blocks = jnp.concatenate(out, axis=0)
    transform = header.get("transform")
    if transform is not None:
        if transform == "zigzag":
            if dtype == "u64":
                # limb-domain unzigzag yields the int64 bit pattern, which
                # IS the (..., 2) limb image of the signed values
                blocks = _unzigzag_device(blocks, dtype)
            else:
                blocks = transforms.zigzag_decode(blocks)
        elif transform == "viewu":
            if dtype != "u64":  # u64 limb image already carries the raw bits
                import jax

                t = layout.bit_width(dtype)
                blocks = jax.lax.bitcast_convert_type(blocks, jnp.dtype(f"int{t}"))
        else:
            raise ValueError(f"unknown transform {transform!r}")
    return blocks


def read_file_device(path: str, mesh=None, use_kernels: bool = True):
    """Whole-file device decode; flat-written columns come back flat and
    trimmed to their exact original length (see fio.write_file)."""
    header = fio.read_header(path)
    blocks = read_blocks_device(path, mesh=mesh, use_kernels=use_kernels)
    if "n_values" in header:
        n = header["n_values"]
        if header["dtype"] == "u64":
            return blocks.reshape(-1, 2)[:n]
        return blocks.reshape(-1)[:n]
    return blocks
