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
