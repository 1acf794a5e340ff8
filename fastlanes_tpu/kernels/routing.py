"""Measured per-(op, dtype, width) fastest-path routing.

The framework has two execution strategies for every codec: the
hand-scheduled Pallas kernel and the XLA ops composition (one semantics —
ops/bitpack.py row streams — traced two ways). Neither dominates: on v5e
the kernel wins most u16 decodes while plain XLA wins u32/u64 materialized
decode and every encode (benchmarks/results_tpu.jsonl). The reference's
whole reason to exist is being the FASTEST decode (reference README.md:5-10),
so the public entry points must always take the measured winner.

This module owns that decision: a committed table of measured throughputs
per (op, dtype, width), generated on real hardware by tools/tune_routing.py
and consulted by kernels.* entry points (auto mode) and parallel/shard.py
(use_kernels="auto"). Missing configs fall back to the nearest measured
width of the same (op, dtype); ops never measured at all default to the
kernel (the pre-routing behavior).
"""

from __future__ import annotations

import functools
import json
import os

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "routing_tpu.json")

_override = None  # test/tuning hook; see set_table()


def set_table(entries) -> None:
    """Override the routing table in-process (None restores the file table).
    `entries` maps "op:dtype:width" -> {strategy: ips, ...}."""
    import sys

    global _override
    _override = entries
    _lookup.cache_clear()
    # strategy lookups cached in consumer modules must follow the table
    for mod_name, attr in (
            ("fastlanes_tpu.ops.bitpack", "_wt_strategy"),
            ("fastlanes_tpu.ops.bitpack", "_pack_wt_strategy"),
            ("fastlanes_tpu.ops.single", "_single_strategy"),
            ("fastlanes_tpu.ops.transpose", "_st_strategy")):
        mod = sys.modules.get(mod_name)
        if mod is not None:
            getattr(mod, attr).cache_clear()


def _entries():
    if _override is not None:
        return _override
    return _load_file()


@functools.lru_cache(maxsize=1)
def _load_file():
    try:
        with open(_TABLE_PATH) as f:
            doc = json.load(f)
        entries = doc["entries"]
    except (OSError, KeyError, json.JSONDecodeError):
        return {}
    _check_provenance(doc.get("platform", ""))
    return entries


@functools.lru_cache(maxsize=1)
def _check_provenance(table_platform: str) -> None:
    """Routing decisions are hardware measurements. If this process runs on
    a TPU generation other than the one the table was tuned on, warn once —
    the decisions still work (both strategies are correct), but the user
    should regenerate with tools/tune_routing.py for fastest-path claims."""
    import warnings

    try:
        import jax

        dev = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return
    if dev.platform != "tpu":
        return  # off-TPU callers use defaults/explicit strategies
    kind = getattr(dev, "device_kind", "")
    if table_platform and kind and kind not in table_platform:
        warnings.warn(
            f"kernels/routing_tpu.json was tuned on {table_platform!r} but "
            f"this process runs on {kind!r}; regenerate with "
            "tools/tune_routing.py for measured fastest-path routing",
            RuntimeWarning, stacklevel=3)


# Stability margin: the kernel must beat ops by >8% to win a config. The
# ops path is compile-stable; the Pallas path occasionally compiles SLOW
# for the same program (observed on v5e u8 mid-widths: the identical W=4
# decode kernel measured 118e9 in one jit context and 51.7e9 in another —
# round 1's "u8 W=3 44e9 anomaly" was the same effect). Small kernel wins
# are not worth that variance; large ones (W=T copies +86%, fused zdelta
# +74%, u64 wide-width limbs +3x) keep the kernel.
_PALLAS_MARGIN = 1.08


# Unmeasured-op defaults. Classic codec entries keep the kernel (the
# pre-routing behavior). Original-order decode entries default to the flat
# one-pass 'gat' formulation (ops/orig.py): round-4 v5e measurements put it
# within ~25% of the per-width winner at EVERY u32 width, while the former
# 'od' select-chain default collapsed to 2.6% of SoL at W=25 (O(W) output
# passes — BENCH_r03 / VERDICT r3 items 1-2) and 'compose' pays a
# standalone untranspose.
_UNMEASURED_DEFAULT = {
    "unpack_orig": "gat",
    "undelta_pack_orig": "gat",
    "unzdelta_pack_orig": "gat",
    "unpack_wt": "assemble",  # the W=T relayout slots (ops/bitpack.py)
    "pack_wt": "assemble",
    "delta_pack_orig_enc": "od",  # encode duals (ops/orig.py)
    "zdelta_pack_orig_enc": "od",
    "transpose_st": "permute",    # standalone relayouts (ops/transpose.py)
    "untranspose_st": "permute",
    "unpack_single": "gather",    # dense-K random access (ops/single.py)
}

#: every execution strategy a table entry may name
_STRATEGIES = frozenset(("pallas", "ops", "od", "gat", "rep", "compose",
                         "composeo", "assemble", "gather", "grouptake",
                         "mxu", "mxu8", "permute", "decode", "bitrev",
                         "axes"))


@functools.lru_cache(maxsize=None)
def _lookup(op: str, dtype: str, width: int):
    """Winner strategy for (op, dtype, width) — 'pallas' | 'ops' for the
    classic entries, 'od' | 'compose' for the *_orig entries. Nearest
    measured width of the same (op, dtype) stands in for unmeasured widths
    (ties toward the lower width); fully unmeasured ops use
    _UNMEASURED_DEFAULT ('pallas' when unlisted)."""
    entries = _entries()
    exact = entries.get(f"{op}:{dtype}:{width}")
    if exact is None:
        candidates = []
        prefix = f"{op}:{dtype}:"
        for key in entries:
            if key.startswith(prefix):
                candidates.append(int(key[len(prefix):]))
        if not candidates:
            return _UNMEASURED_DEFAULT.get(op, "pallas")
        nearest = min(candidates, key=lambda w: (abs(w - width), w))
        exact = entries[f"{op}:{dtype}:{nearest}"]
    best, best_v = _UNMEASURED_DEFAULT.get(op, "pallas"), -1.0
    for strat, ips in exact.items():
        # entries may carry metadata fields (blocks, K, ...) — only known
        # strategy names participate in the argmax
        if strat not in _STRATEGIES or not isinstance(ips, (int, float)):
            continue
        # the Pallas strategy pays the compile-stability discount
        v = ips / _PALLAS_MARGIN if strat == "pallas" else float(ips)
        if v > best_v:
            best, best_v = strat, v
    return best


def best_path(op: str, dtype: str, width: int) -> str:
    from ..core import layout

    return _lookup(op, layout.canon_dtype(dtype), int(width))


def use_pallas(op: str, dtype: str, width: int) -> bool:
    return best_path(op, dtype, width) == "pallas"
