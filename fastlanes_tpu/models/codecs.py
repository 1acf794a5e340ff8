"""Codec drivers: encode/decode pipelines composed from the ops layer.

The reference crate has no encoder driver — tests/benches compose
transpose -> delta -> pack by hand (reference delta.rs:80-96,
benches/delta.rs:16-27). These classes are that composition as first-class,
jit-friendly framework API, plus automatic width / frame-of-reference
selection (the job Vortex does out-of-tree for the Rust crate).

Width selection is a host decision (packed shapes are static under jit), so
`encode` computes cheap device stats (max / min), pulls one scalar, then
dispatches the pre-jitted (op, dtype, W) kernel from ops.dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..core import layout
from ..ops import _engine as eng
from ..ops import dispatch


def bits_needed(max_value: int) -> int:
    """Smallest W with max_value < 2^W (0 for max_value == 0)."""
    return int(max_value).bit_length()


def _device_max(values, dtype) -> int:
    vec = eng.to_vec(values, dtype)
    if eng.is_limb(dtype):
        lo, hi = vec
        m_hi = int(jnp.max(hi))
        # max lo among rows achieving max hi
        m_lo = int(jnp.max(jnp.where(hi == m_hi, lo, 0)))
        return (m_hi << 32) | m_lo
    return int(jnp.max(vec))


def _device_min(values, dtype) -> int:
    vec = eng.to_vec(values, dtype)
    if eng.is_limb(dtype):
        lo, hi = vec
        m_hi = int(jnp.min(hi))
        m_lo = int(jnp.min(jnp.where(hi == m_hi, lo, np.uint32(0xFFFFFFFF))))
        return (m_hi << 32) | m_lo
    return int(jnp.min(vec))


@dataclasses.dataclass
class Encoded:
    """A compressed batch of 1024-value blocks.

    payload is byte-identical to the Rust crate's packed output for the same
    (codec, width, params). `params` carries the FoR reference or the Delta
    per-lane base."""

    codec: str
    dtype: str
    width: int
    n_blocks: int
    payload: Any
    params: Any = None

    @property
    def packed_bytes(self) -> int:
        """Payload bytes plus any array params (e.g. the delta base vectors —
        LANES words per block, which persistence must store)."""
        elem = layout.bit_width(self.dtype) // 8
        n = self.n_blocks * layout.packed_len(self.dtype, self.width) * elem
        for val in (self.params or {}).values():
            if not isinstance(val, (int, np.integer)):
                n += np.asarray(val).nbytes  # u64 params may be uint32 limb images
        return n

    @property
    def raw_bytes(self) -> int:
        return self.n_blocks * layout.BLOCK * (layout.bit_width(self.dtype) // 8)

    @property
    def compression_ratio(self) -> float:
        return self.raw_bytes / max(self.packed_bytes, 1)


def _n_blocks_of(values, dtype) -> int:
    vec = eng.to_vec(values, dtype)
    arr = vec[0] if eng.is_limb(dtype) else vec
    return 1 if arr.ndim == 1 else arr.shape[0]


class Codec:
    """Base codec interface: encode (B, 1024) blocks -> Encoded -> decode."""

    name: str = "base"

    def __init__(self, dtype, width: Optional[int] = None):
        self.dtype = layout.canon_dtype(dtype)
        self.width = None if width is None else layout.check_width(self.dtype, width)

    def encode(self, values) -> Encoded:  # pragma: no cover - abstract
        raise NotImplementedError

    def decode(self, enc: Encoded):  # pragma: no cover - abstract
        raise NotImplementedError


class BitPackedCodec(Codec):
    """Plain fixed-width bit-packing (BitPacking trait, bitpacking.rs:16-59)."""

    name = "bitpack"

    def encode(self, values) -> Encoded:
        w = self.width if self.width is not None else min(
            layout.bit_width(self.dtype), bits_needed(_device_max(values, self.dtype)))
        payload = dispatch.get("pack", self.dtype, w)(values)
        return Encoded(self.name, self.dtype, w, _n_blocks_of(values, self.dtype), payload)

    def decode(self, enc: Encoded):
        return dispatch.get("unpack", enc.dtype, enc.width)(enc.payload)

    def decode_single(self, enc: Encoded, index):
        return dispatch.get("unpack_single", enc.dtype, enc.width)(enc.payload, index)


class FFoRCodec(Codec):
    """Frame-of-reference + pack (FoR trait, ffor.rs:4-18). reference = min
    (one scalar per batch), width covers (max - min)."""

    name = "ffor"

    def __init__(self, dtype, width: Optional[int] = None, reference: Optional[int] = None):
        super().__init__(dtype, width)
        self.reference = reference

    def encode(self, values) -> Encoded:
        ref = self.reference if self.reference is not None else _device_min(values, self.dtype)
        if self.width is not None:
            w = self.width
        else:
            t = layout.bit_width(self.dtype)
            spread = (_device_max(values, self.dtype) - ref) % (1 << t)
            w = min(t, bits_needed(spread))
        payload = dispatch.get("for_pack", self.dtype, w)(values, _as_param(ref, self.dtype))
        return Encoded(self.name, self.dtype, w, _n_blocks_of(values, self.dtype),
                       payload, params={"reference": ref})

    def decode(self, enc: Encoded):
        ref = _as_param(enc.params["reference"], enc.dtype)
        return dispatch.get("unfor_pack", enc.dtype, enc.width)(enc.payload, ref)


class DeltaCodec(Codec):
    """Transpose -> per-lane delta -> pack; fused single-pass decode
    (the delta.rs:80-96 pipeline as a driver). Stores the per-lane base
    (first value of each lane's walk, i.e. row 0 — transposed positions
    [0, LANES), since index(0, lane) == lane) so the first delta is zero and
    sorted data packs to gap-width; decode returns values in original order
    (untranspose applied)."""

    name = "delta"

    def encode(self, values) -> Encoded:
        dt = self.dtype
        transposed = dispatch.get("transpose", dt, 0)(values)
        nl = layout.lanes(dt)
        base = _lane_base(transposed, dt, nl)
        deltas = dispatch.get("delta", dt, 0)(transposed, base)
        if self.width is not None:
            w = self.width
        else:
            w = min(layout.bit_width(dt), bits_needed(_device_max(deltas, dt)))
        payload = dispatch.get("pack", dt, w)(deltas)
        return Encoded(self.name, dt, w, _n_blocks_of(values, dt), payload,
                       params={"base": base})

    def decode(self, enc: Encoded):
        transposed = dispatch.get("undelta_pack", enc.dtype, enc.width)(
            enc.payload, enc.params["base"])
        return dispatch.get("untranspose", enc.dtype, 0)(transposed)


class ZDeltaCodec(Codec):
    """Delta with zigzag'd deltas: Transpose -> Delta -> zigzag -> pack.
    Plain delta wraps small NEGATIVE steps to ~2^T (full width); zigzag
    keeps them small, so noisy-sorted data packs tightly. All stages run on
    device (zigzag is 3 vector ops XLA fuses into the pipeline; u64 uses
    the 32-bit limb formulation, transforms.zigzag_*_limb)."""

    name = "zdelta"

    def encode(self, values) -> Encoded:
        dt = self.dtype
        transposed = dispatch.get("transpose", dt, 0)(values)
        base = _lane_base(transposed, dt, layout.lanes(dt))
        deltas = dispatch.get("delta", dt, 0)(transposed, base)
        zz = _zigzag_device(deltas, dt)
        if self.width is not None:
            w = self.width
        else:
            w = min(layout.bit_width(dt), bits_needed(_device_max(zz, dt)))
        payload = dispatch.get("pack", dt, w)(zz)
        return Encoded(self.name, dt, w, _n_blocks_of(values, dt), payload,
                       params={"base": base})

    def decode(self, enc: Encoded):
        zz = dispatch.get("unpack", enc.dtype, enc.width)(enc.payload)
        deltas = _unzigzag_device(zz, enc.dtype)
        transposed = dispatch.get("undelta", enc.dtype, 0)(deltas, enc.params["base"])
        return dispatch.get("untranspose", enc.dtype, 0)(transposed)


def _zigzag_device(deltas, dtype):
    import jax

    from .. import transforms

    if eng.is_limb(dtype):
        arr = jnp.asarray(deltas)
        return jnp.stack(transforms.zigzag_encode_limb(arr[..., 0], arr[..., 1]), -1)
    t = layout.bit_width(dtype)
    signed = jax.lax.bitcast_convert_type(deltas, jnp.dtype(f"int{t}"))
    return transforms.zigzag_encode(signed)


def _unzigzag_device(codes, dtype):
    import jax

    from .. import transforms

    if eng.is_limb(dtype):
        arr = jnp.asarray(codes)
        return jnp.stack(transforms.zigzag_decode_limb(arr[..., 0], arr[..., 1]), -1)
    t = layout.bit_width(dtype)
    return jax.lax.bitcast_convert_type(
        transforms.zigzag_decode(codes), jnp.dtype(f"uint{t}"))


def _zero_base(values, dtype, nl):
    if eng.is_limb(dtype):
        return jnp.zeros((nl, 2), jnp.uint32)
    return jnp.zeros((nl,), eng.jnp_dtype(dtype))


def _lane_base(transposed, dtype, nl):
    """Per-lane seed = row 0 of each lane's walk. In transposed order
    index(0, lane) == lane (FL_ORDER[0] == 0, reference macros.rs:20-24),
    so the seeds are the first LANES positions of every block."""
    arr = jnp.asarray(transposed)
    if eng.is_limb(dtype) and arr.dtype == jnp.uint32:
        return arr[..., :nl, :]
    return arr[..., :nl]


def _as_param(value: int, dtype):
    if eng.is_limb(dtype):
        return jnp.array([value & 0xFFFFFFFF, (value >> 32) & 0xFFFFFFFF], jnp.uint32)
    return jnp.asarray(np.asarray(value, layout.np_dtype(dtype)))


_CODECS = {c.name: c for c in (BitPackedCodec, FFoRCodec, DeltaCodec, ZDeltaCodec)}


def get_codec(name: str, dtype, **kw) -> Codec:
    try:
        cls = _CODECS[name]
    except KeyError:
        raise ValueError(f"unknown codec {name!r}; have {sorted(_CODECS)}") from None
    return cls(dtype, **kw)


def auto_encode(values, dtype) -> Encoded:
    """Pick the smallest-output codec among bitpack/ffor/delta for this batch.
    Simple, deterministic model selection — stats are 3 cheap device
    reductions; encode runs once for the winner."""
    candidates = []
    dt = layout.canon_dtype(dtype)
    t = layout.bit_width(dt)
    vmax = _device_max(values, dt)
    vmin = _device_min(values, dt)
    candidates.append(("bitpack", float(min(t, bits_needed(vmax)))))
    candidates.append(("ffor", float(min(t, bits_needed((vmax - vmin) % (1 << t))))))
    # delta/zdelta width needs the deltas themselves; their per-block base
    # costs LANES*T = 1024 bits per 1024-value block = exactly +1 bit/value
    transposed = dispatch.get("transpose", dt, 0)(values)
    base = _lane_base(transposed, dt, layout.lanes(dt))
    deltas = dispatch.get("delta", dt, 0)(transposed, base)
    candidates.append(("delta", min(t, bits_needed(_device_max(deltas, dt))) + 1.0))
    zz = _zigzag_device(deltas, dt)
    candidates.append(("zdelta", min(t, bits_needed(_device_max(zz, dt))) + 1.0))
    name, cost = min(candidates, key=lambda c: c[1])
    if name == "ffor":
        return FFoRCodec(dt, width=int(cost), reference=vmin).encode(values)
    if name in ("delta", "zdelta"):
        return get_codec(name, dt, width=int(cost - 1.0)).encode(values)
    return get_codec(name, dt, width=int(cost)).encode(values)
