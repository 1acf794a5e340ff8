"""Distribution tests on the virtual 8-device CPU mesh: data-parallel codec
execution, replicated params, pmax width agreement, all-gather in vector
order, psum'd round-trip validation."""

import jax
import numpy as np
import pytest

from fastlanes_tpu import parallel
from fastlanes_tpu.core import layout
from fastlanes_tpu.ref import numpy_ref as ref

from conftest import random_values
from test_ops_vs_ref import from_jax_form, to_jax_form


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return parallel.make_mesh()


def test_mesh_shape(mesh):
    assert mesh.shape["blocks"] == 8


@pytest.mark.parametrize("dt", layout.DTYPES)
def test_sharded_pack_unpack(mesh, dt, rng):
    w = max(1, layout.bit_width(dt) // 2 - 1)
    values = random_values(rng, dt, w, n_blocks=32)
    gold = ref.pack(values, w, dt)

    packed = parallel.sharded_pack(mesh, to_jax_form(values, dt), w, dt, use_kernels=False)
    np.testing.assert_array_equal(from_jax_form(packed, dt), gold)

    out = parallel.sharded_unpack(mesh, to_jax_form(gold, dt), w, dt, use_kernels=False)
    np.testing.assert_array_equal(from_jax_form(out, dt), values)


def test_sharded_uneven_blocks(mesh, rng):
    """Block counts not divisible by the mesh get padded and un-padded."""
    values = random_values(rng, "u32", 9, n_blocks=13)
    packed = parallel.sharded_pack(mesh, values, 9, "u32", use_kernels=False)
    np.testing.assert_array_equal(np.asarray(packed), ref.pack(values, 9, "u32"))


def test_sharded_fused_delta(mesh, rng):
    values = np.sort(random_values(rng, "u16", 15, n_blocks=16), axis=1)
    base = np.zeros(64, np.uint16)
    transposed = ref.transpose(values, "u16")
    deltas = ref.delta(transposed, np.broadcast_to(base, (16, 64)), "u16")
    packed = ref.pack(deltas, 15, "u16")

    out = parallel.sharded_undelta_pack(mesh, packed, base, 15, "u16", use_kernels=False)
    np.testing.assert_array_equal(np.asarray(out), transposed)


def test_sharded_ffor(mesh, rng):
    w, reference = 8, 1000
    values = random_values(rng, "u32", 7, n_blocks=16) + np.uint32(reference)
    packed = parallel.sharded_for_pack(mesh, values, reference, w, "u32", use_kernels=False)
    np.testing.assert_array_equal(np.asarray(packed),
                                  ref.for_pack(values, reference, w, "u32"))
    out = parallel.sharded_unfor_pack(mesh, packed, reference, w, "u32", use_kernels=False)
    np.testing.assert_array_equal(np.asarray(out), values)


@pytest.mark.parametrize("dt", ["u32", "u64"])
def test_global_max_bits(mesh, dt, rng):
    values = random_values(rng, dt, 5, n_blocks=8)
    # plant a single large value on what will land on the last device
    big = (1 << 22) + 5
    values[-1, -1] = layout.np_dtype(dt).type(big)
    got = int(parallel.global_max_bits(mesh, to_jax_form(values, dt), dt))
    assert got == big.bit_length() == 23


def test_global_max_bits_u64_high_limb(mesh, rng):
    values = random_values(rng, "u64", 10, n_blocks=8)
    values[3, 100] = np.uint64((1 << 45) + 17)
    got = int(parallel.global_max_bits(mesh, to_jax_form(values, "u64"), "u64"))
    assert got == 46


def test_all_gather_packed(mesh, rng):
    values = random_values(rng, "u32", 9, n_blocks=16)
    gold = ref.pack(values, 9, "u32")
    packed = parallel.sharded_pack(mesh, values, 9, "u32", use_kernels=False)
    gathered = parallel.all_gather_packed(mesh, packed, "u32")
    np.testing.assert_array_equal(np.asarray(gathered), gold)


def test_sharded_roundtrip_check(mesh, rng):
    values = random_values(rng, "u32", 13, n_blocks=24)
    bad = int(parallel.sharded_roundtrip_check(mesh, values, 13, "u32", use_kernels=False))
    assert bad == 0


def test_full_distributed_pipeline(mesh, rng):
    """The end-to-end distributed flow of the north star: agree on width via
    pmax -> FFoR-encode data-parallel -> all-gather packed in vector order ->
    decode -> bit-exact."""
    reference = 5000
    values = random_values(rng, "u32", 11, n_blocks=32) + np.uint32(reference)
    width = int(parallel.global_max_bits(mesh, values - np.uint32(reference), "u32"))
    packed = parallel.sharded_for_pack(mesh, values, reference, width, "u32",
                                       use_kernels=False)
    gathered = parallel.all_gather_packed(mesh, packed, "u32")
    out = parallel.sharded_unfor_pack(mesh, gathered, reference, width, "u32",
                                      use_kernels=False)
    np.testing.assert_array_equal(np.asarray(out), values)
