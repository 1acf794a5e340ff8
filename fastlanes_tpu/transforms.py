"""Value transforms applied before/after the FastLanes codecs.

Zigzag maps signed integers to unsigned so small-magnitude values (positive
or negative) get small codes: u = (v << 1) ^ (v >> (T-1)) (arithmetic
shift); v = (u >> 1) ^ -(u & 1). A pre-transform, not a wire-format change —
the packed bytes remain standard FastLanes for the mapped unsigned values.
(The reference crate is unsigned-only; this is framework surface for real
signed columns.)

Both numpy (host IO path) and jnp (device path) implementations.
"""

from __future__ import annotations

import numpy as np


def zigzag_encode_np(values: np.ndarray) -> np.ndarray:
    """Signed array -> same-width unsigned zigzag codes."""
    if values.dtype.kind != "i":
        raise ValueError(f"zigzag encodes signed integers, got {values.dtype}")
    t = values.dtype.itemsize * 8
    u = values.astype(np.dtype(f"uint{t}"))
    return ((u << 1) ^ (values >> (t - 1)).astype(u.dtype))


def zigzag_decode_np(codes: np.ndarray) -> np.ndarray:
    """Unsigned zigzag codes -> signed array of the same width."""
    if codes.dtype.kind != "u":
        raise ValueError(f"zigzag decodes unsigned codes, got {codes.dtype}")
    t = codes.dtype.itemsize * 8
    s = np.dtype(f"int{t}")
    return ((codes >> 1) ^ (-(codes & 1).astype(s)).astype(codes.dtype)).astype(s)


def zigzag_encode(values):
    """jnp twin (device path); u64 not supported without x64."""
    import jax.numpy as jnp

    t = values.dtype.itemsize * 8
    u = values.astype(jnp.dtype(f"uint{t}"))
    return (u << 1) ^ (values >> (t - 1)).astype(u.dtype)


def zigzag_decode(codes):
    import jax.numpy as jnp

    t = codes.dtype.itemsize * 8
    s = jnp.dtype(f"int{t}")
    return ((codes >> 1) ^ (-(codes & 1).astype(s)).astype(codes.dtype)).astype(s)


# -- device limb-pair twins (u64 as (lo, hi) uint32; no 64-bit vector ints) --
# Both masks are all-ones/zero in BOTH limbs, so everything stays pure
# 32-bit vector math. The single source of truth for the limb zigzag —
# kernels, ops drivers, and device IO all call these.


def zigzag_encode_limb(lo, hi):
    """u = (v << 1) ^ (v >> 63) on a two's-complement (lo, hi) limb pair."""
    import jax.numpy as jnp

    m = jnp.uint32(0) - (hi >> 31)  # arithmetic sign of the 64-bit value
    return (lo << 1) ^ m, ((hi << 1) | (lo >> 31)) ^ m


def zigzag_decode_limb(lo, hi):
    """v = (u >> 1) ^ -(u & 1) on a (lo, hi) limb pair of zigzag codes."""
    import jax.numpy as jnp

    m = jnp.uint32(0) - (lo & jnp.uint32(1))
    return ((lo >> 1) | (hi << 31)) ^ m, (hi >> 1) ^ m
