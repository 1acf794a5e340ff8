"""fastlanes_tpu — a TPU-native FastLanes lightweight-compression framework.

A from-scratch JAX/XLA/Pallas implementation of the FastLanes compression
layout (Afroozeh & Boncz, VLDB 2023) with the full capability surface of the
Rust reference crate (spiraldb/fastlanes v0.1.8): fixed-width bit-packing,
Delta, frame-of-reference (FFoR) and the 04261537 interleaved transpose over
1024-value blocks of u8/u16/u32/u64 — bit-compatible with the Rust crate's
(transposed-order) wire format — plus new TPU-native surface: batched jit
ops, Pallas VPU kernels, runtime-width dispatch, sharded multi-chip/multi-host
execution over a jax.sharding.Mesh, and a C++ host-side codec.

Layer map (mirrors SURVEY.md §1/§7):
  core/      layout spec: FL_ORDER, index maps, inverse tables   (L0)
  ref/       NumPy oracle, slow-but-exact                        (conformance)
  ops/       pure-jnp XLA ops, batched + jittable                (L1-L2)
  kernels/   Pallas TPU kernels for the hot paths                (L2 fast path)
  models/    composed codecs (BitPacked/Delta/FFoR/auto)         (L3 API)
  parallel/  mesh + shard_map distribution, multi-host           (new surface)
  native/    C++ host codec (ctypes), independent oracle + IO    (host runtime)
"""

__version__ = "0.1.0"

from .core import layout
from .core.layout import BLOCK, DTYPES, FL_ORDER, bit_width, lanes, packed_len

__all__ = [
    "layout", "BLOCK", "DTYPES", "FL_ORDER", "bit_width", "lanes", "packed_len",
    "pack", "unpack", "unpack_single", "delta", "undelta", "undelta_pack",
    "delta_pack", "for_pack", "unfor_pack", "transpose", "untranspose",
    "unchecked_pack", "unchecked_unpack", "unchecked_unpack_single",
    "auto_encode", "get_codec", "write_file", "read_file", "read_blocks",
    "read_single", "__version__",
]


def __getattr__(name):
    """Top-level re-exports (the reference's `pub use ...::*`, lib.rs:17-20),
    resolved lazily so `import fastlanes_tpu` stays cheap until jax is used."""
    from .ops import bitpack as _bitpack, delta as _delta, dispatch as _dispatch
    from .ops import ffor as _ffor, single as _single, transpose as _transpose

    ops_api = {
        "pack": _bitpack.pack, "unpack": _bitpack.unpack,
        "unpack_single": _single.unpack_single,
        "delta": _delta.delta, "undelta": _delta.undelta,
        "undelta_pack": _delta.undelta_pack, "delta_pack": _delta.delta_pack,
        "for_pack": _ffor.for_pack, "unfor_pack": _ffor.unfor_pack,
        "transpose": _transpose.transpose, "untranspose": _transpose.untranspose,
        "unchecked_pack": _dispatch.unchecked_pack,
        "unchecked_unpack": _dispatch.unchecked_unpack,
        "unchecked_unpack_single": _dispatch.unchecked_unpack_single,
    }
    if name in ops_api:
        return ops_api[name]
    if name in ("auto_encode", "get_codec"):
        from .models import codecs as _codecs
        return getattr(_codecs, name)
    if name in ("write_file", "read_file", "read_blocks", "read_single"):
        from . import fio as _fio
        return getattr(_fio, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
