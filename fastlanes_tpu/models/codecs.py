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
        # max lo among rows achieving max hi (m_hi may exceed int32 —
        # compare against a uint32 scalar, not a weak-typed Python int)
        m_lo = int(jnp.max(jnp.where(hi == jnp.uint32(m_hi), lo, jnp.uint32(0))))
        return (m_hi << 32) | m_lo
    return int(jnp.max(vec))


def _device_min(values, dtype) -> int:
    vec = eng.to_vec(values, dtype)
    if eng.is_limb(dtype):
        lo, hi = vec
        m_hi = int(jnp.min(hi))
        m_lo = int(jnp.min(jnp.where(hi == jnp.uint32(m_hi), lo,
                                     np.uint32(0xFFFFFFFF))))
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
            if isinstance(val, (int, np.integer, str, tuple)):
                continue  # scalar metadata is header-sized, not payload
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
        from .. import kernels
        from ..ops import orig as ops_orig

        dt = self.dtype
        if self.width is not None:
            w = self.width
        else:
            # width probe in the original domain (no transpose materialized)
            d = ops_orig.deltas_orig(values, dt)
            w = min(layout.bit_width(dt), bits_needed(_device_max(d, dt)))
        payload, base = kernels.delta_pack_orig(values, w, dt)
        return Encoded(self.name, dt, w, _n_blocks_of(values, dt), payload,
                       params={"base": base})

    def decode(self, enc: Encoded):
        from .. import kernels

        # routed original-order fused decode: no standalone untranspose pass
        return kernels.undelta_pack_orig(enc.payload, enc.params["base"],
                                         enc.width, enc.dtype)


class ZDeltaCodec(Codec):
    """Delta with zigzag'd deltas: Transpose -> Delta -> zigzag -> pack.
    Plain delta wraps small NEGATIVE steps to ~2^T (full width); zigzag
    keeps them small, so noisy-sorted data packs tightly. All stages run on
    device (zigzag is 3 vector ops XLA fuses into the pipeline; u64 uses
    the 32-bit limb formulation, transforms.zigzag_*_limb)."""

    name = "zdelta"

    def encode(self, values) -> Encoded:
        from .. import kernels
        from ..ops import orig as ops_orig

        dt = self.dtype
        if self.width is not None:
            w = self.width
        else:
            zz = ops_orig.deltas_orig(values, dt, zigzag=True)
            w = min(layout.bit_width(dt), bits_needed(_device_max(zz, dt)))
        payload, base = kernels.delta_pack_orig(values, w, dt, zigzag=True)
        return Encoded(self.name, dt, w, _n_blocks_of(values, dt), payload,
                       params={"base": base})

    def decode(self, enc: Encoded):
        from .. import kernels

        # one routed pass: unpack -> unzigzag -> prefix-sum -> original order
        return kernels.unzdelta_pack_orig(enc.payload, enc.params["base"],
                                          enc.width, enc.dtype)


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


class RLECodec(Codec):
    """Run-length encoding via the run-index vector (FastLanes VLDB'23
    family; fio's `rle` chunks as a driver). Encode is host-side numpy
    (run detection is sequential-ish); decode runs on device: fused
    undelta_pack of the index stream (u16, W=1) -> untranspose -> gather
    over per-block padded run values."""

    name = "rle"

    def __init__(self, dtype, width=None):
        super().__init__(dtype, None)

    def encode(self, values) -> Encoded:
        from .. import fio

        dt = self.dtype
        arr = np.asarray(values)
        if eng.is_limb(dt) and arr.dtype == np.uint32:
            arr = np.ascontiguousarray(arr).view(np.uint64)[..., 0]
        if arr.ndim == 1:
            arr = arr[None]
        if arr.ndim != 2 or arr.shape[1] != layout.BLOCK:
            raise ValueError(f"values must be (B, {layout.BLOCK}), got {arr.shape}")
        arr = arr.astype(layout.np_dtype(dt), copy=False)
        from ..ref import numpy_ref as npref

        counts, run_values, idx = fio._rle_parts(arr)
        transposed = np.ascontiguousarray(npref.transpose(idx, "u16"))
        base = np.ascontiguousarray(transposed[:, :64])
        deltas = npref.delta(transposed, base, "u16")
        payload = npref.pack(deltas, 1, "u16")
        return Encoded(self.name, dt, 1, arr.shape[0], jnp.asarray(payload),
                       params={"base": jnp.asarray(base), "counts": counts,
                               "run_values": run_values})

    def decode(self, enc: Encoded):
        from .. import kernels

        counts = np.asarray(enc.params["counts"])
        run_values = np.asarray(enc.params["run_values"])
        # per-block run index in original order (fused decode), then ONE
        # vectorized gather into the flat run-value stream — no per-block
        # host loop and no padded (B, max_count) staging table (worst-case
        # 1024x memory when any block is run-dense)
        idx = kernels.undelta_pack_orig(enc.payload, enc.params["base"],
                                        1, "u16").astype(jnp.int32)
        offsets = (np.cumsum(counts) - counts).astype(np.int32)
        flat_idx = idx + jnp.asarray(offsets)[:, None]
        if eng.is_limb(enc.dtype):
            rv = np.ascontiguousarray(run_values).view(np.uint32).reshape(-1, 2)
            lo = jnp.take(jnp.asarray(rv[:, 0]), flat_idx, axis=0)
            hi = jnp.take(jnp.asarray(rv[:, 1]), flat_idx, axis=0)
            return jnp.stack([lo, hi], axis=-1)
        return jnp.take(jnp.asarray(run_values), flat_idx, axis=0)


class DictCodec(Codec):
    """Dictionary encoding (FastLanes-family DICT, VLDB'23; not in the Rust
    crate): sorted per-batch dictionary + u16 codes packed with the standard
    bitpack machinery (fio's `dict` chunks as a driver). Encode is host-side
    numpy (np.unique); decode runs on device: routed u16 unpack -> one
    vectorized gather. Sorted dictionary => code order == value order, so
    range predicates push down as code compares."""

    name = "dict"

    def __init__(self, dtype, width=None):
        super().__init__(dtype, None)

    def encode(self, values) -> Encoded:
        from .. import fio

        dt = self.dtype
        arr = np.asarray(values)
        if eng.is_limb(dt) and arr.dtype == np.uint32:
            arr = np.ascontiguousarray(arr).view(np.uint64)[..., 0]
        if arr.ndim == 1:
            arr = arr[None]
        if arr.ndim != 2 or arr.shape[1] != layout.BLOCK:
            raise ValueError(f"values must be (B, {layout.BLOCK}), got {arr.shape}")
        arr = arr.astype(layout.np_dtype(dt), copy=False)
        dictionary, codes = fio._dict_parts(arr)
        if dictionary.size > fio._DICT_MAX:
            raise ValueError(
                f"dict codec: {dictionary.size} distinct values exceed the "
                f"{fio._DICT_MAX}-entry dictionary (u16 code stream)")
        w = int(max(0, int(dictionary.size) - 1).bit_length())
        payload = dispatch.get("pack", "u16", w)(codes)
        return Encoded(self.name, dt, w, arr.shape[0], payload,
                       params={"dictionary": dictionary})

    def decode(self, enc: Encoded):
        codes = dispatch.get("unpack", "u16", enc.width)(enc.payload)
        idx = codes.astype(jnp.int32)
        dictionary = np.asarray(enc.params["dictionary"])
        if eng.is_limb(enc.dtype):
            dv = np.ascontiguousarray(dictionary).view(np.uint32).reshape(-1, 2)
            lo = jnp.take(jnp.asarray(dv[:, 0]), idx, axis=0)
            hi = jnp.take(jnp.asarray(dv[:, 1]), idx, axis=0)
            return jnp.stack([lo, hi], axis=-1)
        return jnp.take(jnp.asarray(dictionary), idx, axis=0)


class ALPCodec(Codec):
    """ALP float compression driver (see fastlanes_tpu.alp): host encode
    (float64 scaling + exact-roundtrip exception detection), device decode
    (unpack -> unshift -> multiply/divide -> exception scatter). `dtype`
    here is the VALUE dtype ('f32'/'f64'); the wire dtype is u32/u64.
    Beyond-parity surface — the Rust reference crate is integer-only."""

    name = "alp"

    def __init__(self, dtype="f32", width=None):
        if str(dtype) not in ("f32", "f64", "float32", "float64"):
            raise ValueError(f"ALPCodec takes 'f32'/'f64', got {dtype!r}")
        self.vtype = "f32" if str(dtype) in ("f32", "float32") else "f64"
        self.dtype = "u32" if self.vtype == "f32" else "u64"
        self.width = width

    def encode(self, values) -> Encoded:
        from .. import alp as alp_mod

        arr = np.asarray(values)
        want = np.float32 if self.vtype == "f32" else np.float64
        if arr.dtype != want:
            raise ValueError(f"expected {want.__name__} values, got {arr.dtype}")
        if arr.ndim not in (1, 2) or arr.shape[-1] != layout.BLOCK:
            raise ValueError(f"values must be (B, {layout.BLOCK}) or "
                             f"({layout.BLOCK},); arbitrary lengths go through "
                             f"fio.write_file (it pads)")
        enc = alp_mod.encode_np(arr)
        w = enc["width"]
        ints = enc["ints"]
        if self.dtype == "u64":  # limb image for the device packers
            ints = np.ascontiguousarray(ints).view(np.uint32).reshape(*ints.shape, 2)
        payload = dispatch.get("pack", self.dtype, w)(ints)
        return Encoded(self.name, self.dtype, w, _n_blocks_of_shape(arr.shape),
                       payload, params={
                           "e": enc["e"], "f": enc["f"],
                           "reference": enc["reference"],
                           "exc_pos": enc["exc_pos"], "exc_val": enc["exc_val"],
                           "vtype": self.vtype, "shape": arr.shape})

    def decode(self, enc: Encoded):
        from .. import alp as alp_mod

        p = enc.params
        np_float = np.float32 if p["vtype"] == "f32" else np.float64
        shifted = dispatch.get("unpack", enc.dtype, enc.width)(enc.payload)
        arr = jnp.asarray(shifted)
        if enc.dtype == "u64" and arr.dtype == jnp.uint32:
            arr = (arr[..., 0].astype(jnp.int64)
                   | (arr[..., 1].astype(jnp.int64) << 32))
        out = alp_mod.decode_device(arr, p["e"], p["f"], p["reference"],
                                    np_float, p["exc_pos"], p["exc_val"])
        return out.reshape(p["shape"])


def _n_blocks_of_shape(shape) -> int:
    return 1 if len(shape) == 1 else shape[0]


_CODECS = {c.name: c for c in (BitPackedCodec, FFoRCodec, DeltaCodec, ZDeltaCodec,
                               RLECodec, DictCodec, ALPCodec)}


def get_codec(name: str, dtype, **kw) -> Codec:
    try:
        cls = _CODECS[name]
    except KeyError:
        raise ValueError(f"unknown codec {name!r}; have {sorted(_CODECS)}") from None
    return cls(dtype, **kw)


def _auto_plan(values, dt):
    """One device probe pass shared by cost model and winner encode.

    Returns (costs, widths, intermediates): `costs[name]` is the EXACT
    payload+params byte count `Encoded.packed_bytes` would report for that
    codec (payload = n_blocks * packed_len(W) * elem bytes; delta/zdelta add
    their per-block (B, LANES) base, ffor's int reference is free), and
    `intermediates` carries (vmin, transposed-deltas, zigzag codes) so the
    winner packs directly — no second transpose/delta device pass."""
    t = layout.bit_width(dt)
    nl = layout.lanes(dt)
    elem = t // 8
    n_blocks = _n_blocks_of(values, dt)

    def payload_bytes(w):
        return n_blocks * layout.packed_len(dt, w) * elem

    vmax = _device_max(values, dt)
    vmin = _device_min(values, dt)
    widths = {
        "bitpack": min(t, bits_needed(vmax)),
        "ffor": min(t, bits_needed((vmax - vmin) % (1 << t))),
    }
    from ..ops import orig as ops_orig

    # delta widths probed in the ORIGINAL domain — no transpose materialized
    d = ops_orig.deltas_orig(values, dt)
    widths["delta"] = min(t, bits_needed(_device_max(d, dt)))
    zz = ops_orig.deltas_orig(values, dt, zigzag=True)
    widths["zdelta"] = min(t, bits_needed(_device_max(zz, dt)))
    widths["rle"] = 1
    base_bytes = n_blocks * nl * elem  # np.asarray(base).nbytes, incl. limbs
    # rle exact bytes: W=1 idx stream is 128 B/block for EVERY dtype, plus
    # the u16 base (128 B/block), int64 counts (8 B/block), and the run
    # values at elem bytes each (run count = one cheap device reduction)
    vec = eng.to_vec(values, dt)
    if eng.is_limb(dt):
        lo, hi = vec
        step = (lo[..., 1:] != lo[..., :-1]) | (hi[..., 1:] != hi[..., :-1])
    else:
        step = vec[..., 1:] != vec[..., :-1]
    n_runs = int(jnp.sum(step)) + n_blocks
    # dict: distinct count via ONE device sort (two-key lexicographic sort
    # in the u64 limb domain); codes ride a u16 stream, dictionary is raw
    import jax

    from .. import fio

    if eng.is_limb(dt):
        lo, hi = vec
        hs, ls = jax.lax.sort([hi.reshape(-1), lo.reshape(-1)], num_keys=2)
        distinct = (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1])
    else:
        s = jnp.sort(vec.reshape(-1))
        distinct = s[1:] != s[:-1]
    n_dict = int(jnp.sum(distinct)) + 1
    widths["dict"] = max(0, n_dict - 1).bit_length()
    costs = {
        "bitpack": payload_bytes(widths["bitpack"]),
        "ffor": payload_bytes(widths["ffor"]),
        "delta": payload_bytes(widths["delta"]) + base_bytes,
        "zdelta": payload_bytes(widths["zdelta"]) + base_bytes,
        "rle": n_blocks * (128 + 128 + 8) + n_runs * elem,
        "dict": (n_dict * elem
                 + n_blocks * layout.packed_len("u16", widths["dict"]) * 2
                 if n_dict <= fio._DICT_MAX else float("inf")),
    }
    return costs, widths, vmin


def auto_costs(values, dtype) -> dict:
    """Exact projected packed_bytes per codec for this batch (the auto_encode
    cost model, exposed for inspection/testing)."""
    costs, _, _ = _auto_plan(values, layout.canon_dtype(dtype))
    return costs


# tie-break order: prefer the cheapest DECODE on equal bytes (bitpack needs
# no params, ffor one scalar add, delta a prefix sum, zdelta adds unzigzag,
# rle and dict add a gather)
_TIE_ORDER = {"bitpack": 0, "ffor": 1, "delta": 2, "zdelta": 3, "rle": 4,
              "dict": 5}


def auto_encode(values, dtype) -> Encoded:
    """Pick the smallest-output codec among bitpack/ffor/delta/zdelta.

    Deterministic: exact byte costs from one probe pass (see _auto_plan),
    ties broken toward the simpler decode. The delta-family winner encodes
    through the fused original-domain entry (kernels.delta_pack_orig) — no
    transposed image is ever materialized."""
    from .. import kernels

    dt = layout.canon_dtype(dtype)
    costs, widths, vmin = _auto_plan(values, dt)
    name = min(costs, key=lambda k: (costs[k], _TIE_ORDER[k]))
    w = widths[name]
    n_blocks = _n_blocks_of(values, dt)
    if name == "bitpack":
        payload = dispatch.get("pack", dt, w)(values)
        return Encoded("bitpack", dt, w, n_blocks, payload)
    if name == "ffor":
        payload = dispatch.get("for_pack", dt, w)(values, _as_param(vmin, dt))
        return Encoded("ffor", dt, w, n_blocks, payload,
                       params={"reference": vmin})
    if name == "rle":
        return RLECodec(dt).encode(values)  # host-side run detection
    if name == "dict":
        return DictCodec(dt).encode(values)  # host-side np.unique
    payload, base = kernels.delta_pack_orig(values, w, dt,
                                            zigzag=name == "zdelta")
    return Encoded(name, dt, w, n_blocks, payload, params={"base": base})
