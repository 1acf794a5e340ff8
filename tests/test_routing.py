"""Fastest-path routing: the public entry points must take the measured
winner per (op, dtype, width) — kernels.routing consulted by kernels.* in
auto mode and by parallel.shard use_kernels="auto"."""

import numpy as np
import pytest

from fastlanes_tpu.kernels import pallas_codecs as pk
from fastlanes_tpu.kernels import routing


@pytest.fixture(autouse=True)
def _restore_table():
    yield
    routing.set_table(None)


def test_seeded_table_loads():
    routing.set_table(None)
    entries = routing._entries()
    assert len(entries) >= 90
    # measured v5e facts (tools/tune_routing.py, barrier harness, 16384
    # blocks) the table exists to encode:
    assert routing.best_path("unpack", "u32", 3) == "ops"      # 128.5e9 vs 81.2e9
    assert routing.best_path("pack", "u32", 3) == "ops"        # 74.0e9 vs 51.8e9
    assert routing.best_path("unpack", "u64", 3) == "ops"      # 31.2e9 vs 23.2e9
    assert routing.best_path("unpack", "u8", 2) == "pallas"    # 128.8e9 vs 116.6e9
    assert routing.best_path("unpack", "u16", 16) == "pallas"  # W=T copy: 76.5 vs 41.2
    # the fused zigzag+prefix-sum kernel beats the XLA composition everywhere
    for dt in ("u8", "u16", "u32", "u64"):
        assert routing.best_path("unzdelta_pack", dt, 3) == "pallas"


def test_canonical_dtype_and_nearest_width():
    routing.set_table({
        "unpack:u32:4": {"pallas": 10.0, "ops": 20.0},
        "unpack:u32:16": {"pallas": 30.0, "ops": 5.0},
    })
    assert routing.best_path("unpack", "uint32", 4) == "ops"
    # nearest measured width stands in: W=6 -> 4 (ops), W=12 -> 16 (pallas)
    assert routing.best_path("unpack", "u32", 6) == "ops"
    assert routing.best_path("unpack", "u32", 12) == "pallas"
    # equidistant ties toward the lower width: W=10 -> 4 -> ops
    assert routing.best_path("unpack", "u32", 10) == "ops"


def test_unmeasured_op_defaults_to_kernel():
    routing.set_table({"unpack:u32:4": {"pallas": 1.0, "ops": 2.0}})
    assert routing.best_path("unzdelta_pack", "u32", 4) == "pallas"


def test_route_off_tpu_is_ops():
    # CPU test environment: auto mode always takes the ops path
    use_ops, _ = pk._route("unpack", 3, "u32", None)
    assert use_ops
    # explicit interpret request forces the kernel regardless
    use_ops, interp = pk._route("unpack", 3, "u32", True)
    assert not use_ops and interp is True


def test_route_on_tpu_follows_table(monkeypatch):
    monkeypatch.setattr(pk, "_on_tpu", lambda: True)
    routing.set_table({
        "unpack:u32:3": {"pallas": 1.0, "ops": 2.0},
        "unpack:u16:3": {"pallas": 2.0, "ops": 1.0},
    })
    assert pk._route("unpack", 3, "u32", None) == (True, None)
    assert pk._route("unpack", 3, "u16", None) == (False, False)
    # forcing compiled kernel bypasses the table
    assert pk._route("unpack", 3, "u32", False) == (False, False)


def test_sharded_auto_resolution(monkeypatch):
    from fastlanes_tpu.parallel import shard

    routing.set_table({"unpack:u32:3": {"pallas": 1.0, "ops": 2.0},
                       "unpack:u16:3": {"pallas": 2.0, "ops": 1.0}})
    # off-TPU: auto -> ops
    assert shard._resolve_kernels("auto", "unpack", 3, "u32") is False
    monkeypatch.setattr(pk, "_on_tpu", lambda: True)
    assert shard._resolve_kernels("auto", "unpack", 3, "u32") is False
    assert shard._resolve_kernels("auto", "unpack", 3, "u16") is True
    # explicit settings pass through untouched
    assert shard._resolve_kernels(True, "unpack", 3, "u32") is True
    assert shard._resolve_kernels("interpret", "unpack", 3, "u32") == "interpret"


def test_public_entry_routes_to_ops_off_tpu(rng):
    """kernels.unpack in auto mode off-TPU == the ops path, bit-exact."""
    from fastlanes_tpu.ref import numpy_ref as ref

    values = rng.integers(0, 8, (4, 1024), np.int64).astype(np.uint32)
    gold = ref.pack(values, 3, "u32")
    packed = pk.pack(values, 3, "u32")
    np.testing.assert_array_equal(np.asarray(packed), gold)
    out = pk.unpack(packed, 3, "u32")
    np.testing.assert_array_equal(np.asarray(out), values)


def test_warmup_compiles_routed_entries(rng):
    """kernels.warmup drives every requested routed entry once (CPU: the
    ops fallback) without error and reports the entry count."""
    from fastlanes_tpu import kernels

    n = kernels.warmup(ops=("pack", "unpack", "undelta_pack", "unfor_pack"),
                       dtypes=("u16", "u64"), widths=(1, 3), n_blocks=4)
    assert n == 2 * 2 * 4


def test_metadata_keys_ignored_by_argmax():
    """Per-entry provenance fields (blocks, K, ...) must not participate in
    the strategy argmax."""
    from fastlanes_tpu.kernels import routing

    try:
        routing.set_table({"unpack:u32:3":
                           {"ops": 2.0, "pallas": 1.0, "blocks": 131072}})
        assert routing.best_path("unpack", "u32", 3) == "ops"
        routing.set_table({"undelta_pack_orig:u32:3":
                           {"od": 5.0, "compose": 1.0, "blocks": 99}})
        assert routing.best_path("undelta_pack_orig", "u32", 3) == "od"
    finally:
        routing.set_table(None)


def test_unpack_single_decode_strategy_bit_exact(rng):
    """The routed 'decode' strategy of unpack_single (full decode + one
    gather, taken for dense index sets) must agree with the 2-word 'gather'
    strategy and the oracle on every index (VERDICT r3 item 10)."""
    import numpy as np

    from fastlanes_tpu.kernels import routing
    from fastlanes_tpu.ops import single
    from fastlanes_tpu.ref import numpy_ref as ref

    idx = np.arange(1024)
    for dt, w in (("u32", 3), ("u16", 9), ("u8", 7), ("u64", 33),
                  ("u32", 32), ("u64", 64)):
        from conftest import random_values
        from fastlanes_tpu.utils.testing import to_jax_form

        values = random_values(rng, dt, w, n_blocks=3)
        packed = ref.pack(values, w, dt)
        want = ref.unpack_single(packed, w, idx, dt)
        arg = to_jax_form(packed, dt)
        try:
            routing.set_table({f"unpack_single:{dt}:{w}": {"decode": 1.0}})
            single._single_strategy.cache_clear()
            got_dec = np.asarray(single.unpack_single(arg, w, idx, dt))
            # sparse index sets stay on the gather path regardless
            got_sparse = np.asarray(single.unpack_single(arg, w, idx[:7], dt))
            routing.set_table({f"unpack_single:{dt}:{w}": {"gather": 1.0}})
            single._single_strategy.cache_clear()
            got_gat = np.asarray(single.unpack_single(arg, w, idx, dt))
        finally:
            routing.set_table(None)
            single._single_strategy.cache_clear()
        if dt == "u64":
            want_j = np.asarray(to_jax_form(want, dt))
            np.testing.assert_array_equal(got_dec, want_j)
            np.testing.assert_array_equal(got_gat, want_j)
            np.testing.assert_array_equal(got_sparse, want_j[:, :7])
        else:
            np.testing.assert_array_equal(got_dec, want)
            np.testing.assert_array_equal(got_gat, want)
            np.testing.assert_array_equal(got_sparse, want[:, :7])


def test_transpose_st_strategies_bit_exact(rng):
    """Every standalone-relayout strategy (permute/gather/axes) must equal
    the oracle in both directions; 'axes' is the r4 pure-axis-reversal form
    (FL_ORDER bit-reversal == reversing three split 2-axes)."""
    import numpy as np

    from fastlanes_tpu.kernels import routing
    from fastlanes_tpu.ops import transpose as tr
    from fastlanes_tpu.ref import numpy_ref as ref

    values = rng.integers(0, 1 << 31, (5, 1024), np.int64).astype(np.uint32)
    want_t = ref.transpose(values, "u32")
    want_u = ref.untranspose(values, "u32")
    for strat in ("permute", "gather", "axes", "mxu"):
        try:
            routing.set_table({"transpose_st:u32:0": {strat: 1.0},
                               "untranspose_st:u32:0": {strat: 1.0}})
            tr._st_strategy.cache_clear()
            tr._one_fn.cache_clear()
            np.testing.assert_array_equal(
                np.asarray(tr.transpose(values, "u32")), want_t, err_msg=strat)
            np.testing.assert_array_equal(
                np.asarray(tr.untranspose(values, "u32")), want_u,
                err_msg=strat)
        finally:
            routing.set_table(None)
            tr._st_strategy.cache_clear()
            tr._one_fn.cache_clear()
