"""The gated wide (grouped-rows) decode path stays bit-exact.

_WIDE_DECODE is off by default (measured slower compiled — see
kernels/MOSAIC_NOTES.md) but is kept as a documented experiment; this guards
it against rot so it can be re-evaluated on future toolchains."""

import numpy as np
import pytest

from fastlanes_tpu.core import layout
from fastlanes_tpu.kernels import pallas_codecs as pk
from fastlanes_tpu.ref import numpy_ref as ref


@pytest.fixture
def wide_on():
    old_wide, old_rows = pk._WIDE_DECODE, pk._STAGE_ROWS
    pk._WIDE_DECODE, pk._STAGE_ROWS = True, True  # wide writes row planes
    yield  # _build_call keys its cache on the staging flags
    pk._WIDE_DECODE, pk._STAGE_ROWS = old_wide, old_rows


@pytest.mark.parametrize("dt,w", [("u32", 3), ("u32", 17), ("u32", 31),
                                  ("u16", 3), ("u16", 9), ("u8", 5)])
def test_wide_unpack_bit_exact(wide_on, rng, dt, w):
    values = rng.integers(0, 1 << w, (8, 1024), np.int64).astype(layout.np_dtype(dt))
    packed = ref.pack(values, w, dt)
    got = np.asarray(pk.unpack(packed, w, dt, tile_b=4, interpret=True))
    np.testing.assert_array_equal(got, values)
