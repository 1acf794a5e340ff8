"""Test harness config.

Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
without real multi-chip hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real TPU chip).
"""

import os

# Force CPU (the environment presets JAX_PLATFORMS=axon -> the real chip;
# tests must run on the virtual 8-device CPU mesh). The axon sitecustomize
# registers its PJRT plugin at interpreter startup, so the env var alone is
# not enough — jax.config.update must run before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xFA57)


def width_sweep():
    """All (dtype, width) configs, mirroring the reference's exhaustive
    round-trip sweep (reference bitpacking.rs:273-315: 9+17+33+65 = 126)."""
    from fastlanes_tpu.core import layout

    return [(dt, w) for dt in layout.DTYPES for w in range(layout.bit_width(dt) + 1)]


def width_sample():
    """A cheaper representative sample: W in {0, 1, 3, T/2, T-1, T} per dtype."""
    from fastlanes_tpu.core import layout

    out = []
    for dt in layout.DTYPES:
        t = layout.bit_width(dt)
        for w in sorted({0, 1, 3, t // 2, t - 1, t}):
            out.append((dt, w))
    return out


def ref_pattern(dtype, width, n_blocks=1):
    """The reference crate's test pattern: values[i] = i % (1 << (W % T))
    (reference bitpacking.rs:281)."""
    from fastlanes_tpu.core import layout

    t = layout.bit_width(dtype)
    mod = 1 << (width % t)
    i = np.arange(n_blocks * layout.BLOCK, dtype=np.uint64)
    return (i % mod).astype(layout.np_dtype(dtype)).reshape(n_blocks, layout.BLOCK)


def random_values(rng, dtype, width, n_blocks=2):
    """Random W-bit values (plus full-range values when W == T)."""
    from fastlanes_tpu.core import layout

    t = layout.bit_width(dtype)
    hi = 1 << min(width, t)
    vals = rng.integers(0, hi, size=(n_blocks, layout.BLOCK), dtype=np.uint64)
    return vals.astype(layout.np_dtype(dtype))


@pytest.fixture(autouse=True, scope="module")
def _fresh_xla_compiler_state():
    """XLA's CPU backend segfaults SPORADICALLY while compiling Pallas
    interpret-mode programs late in a full-suite run (observed 3x at
    different test sites — jax compiler.py backend_compile_and_load; the
    same tests pass solo and in most full runs). Dropping the in-process
    executable caches at each module boundary keeps the accumulated
    compiler state small; measured cost is ~1-2 min of re-jitting across
    the whole suite."""
    import jax

    jax.clear_caches()
    yield
