#!/usr/bin/env python
"""Round-4 experiment: pack (encode) formulations under an upstream
elementwise producer (VERDICT r3 item 3).

BENCH_r03: the public pack() measured 54.8e9 ints/s (0.29 SoL) under the
materialized-producer harness (pack(x ^ c)) while pack_map's fused form hit
162.3e9 (0.87). Cause hypothesis: pack consumes the producer through T
narrow column slices (one per transposed row, ops/bitpack.block_rows); XLA
declines to sink the slices through the xor and materializes the producer —
a full extra read+write of the input charged to the encode (expected-traffic
ratio 12.375/4.375 = 2.83x, matching the measured 2.96x).

Candidates below restructure pack so the producer is consumed by a SINGLE
whole-array elementwise chain (so it fuses), with the word formation done
by reduction instead of slice accumulation:

  slices  current ops.bitpack.pack (baseline)
  win     y1 = (x & mask) << SH_col, y2 = straddle carries (x & mask) >> SHR_col
          (two full-lane elementwise passes, per-column constant shift
          vectors), relayout to row-major (B, T, NL) — via one static take
          (win) or a pure reshape/transpose exploiting FL_ORDER being a
          bit-reversal (winb) — then word w = or-reduce over its contiguous
          row window [a_w, b_w) OR the straddle row of the w-1 boundary.
          Disjoint bit ranges make or == add exact.
  dot     same y1/y2 but the segment reduction is an MXU einsum on 16-bit
          planes: word sums of disjoint-bit contributions stay < 2^16 per
          plane, exactly representable in f32.

All candidates are verified byte-identical to the NumPy oracle before any
timing. Reference semantics: macros.rs:35-98 (pack accumulate/carry rules).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fastlanes_tpu.core import layout
from fastlanes_tpu.ops import bitpack as ops_bitpack
from fastlanes_tpu.ref import numpy_ref as ref


def _consts(width, dtype):
    """Per-flat-column constant tables for the windowed formulation."""
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    # row of each group g (inverse of row_offset//nl)
    row_of_group = np.empty(t, np.int64)
    for r in range(t):
        row_of_group[layout.row_offset(r) // nl] = r
    r_of_col = np.repeat(row_of_group, nl)          # (1024,)
    sh = (r_of_col * width) % t
    straddle = (sh + width > t) & (sh > 0)
    shr = np.where(straddle, t - sh, 0)
    return t, nl, row_of_group, sh, straddle, shr


def _row_major(y3, dtype):
    """(B, G, NL) group-major -> (B, T, NL) row-major via static take."""
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    perm = np.array([layout.row_offset(r) // nl for r in range(t)], np.int32)
    return jnp.take(y3, jnp.asarray(perm), axis=1)


def _row_major_bitrev(y3, dtype):
    """Same relayout as _row_major but as pure reshape/transpose: group
    g = s*(T/8) + bitrev(o) because FL_ORDER is the 3-bit bit-reversal."""
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    b = y3.shape[0]
    q = t // 8
    if q == 1:
        return y3
    nb = q.bit_length() - 1
    y = y3.reshape((b, 8) + (2,) * nb + (nl,))
    # reverse the q bits -> o bits, then move o in front of s
    axes = [0] + list(range(2 + nb - 1, 1, -1)) + [1, 2 + nb]
    return jnp.transpose(y, axes).reshape(b, t, nl)


def _windows(width, t):
    """Per-word lo-window [a_w, b_w) in row space + straddle row (or None)."""
    wins = []
    for w in range(width):
        rows = [r for r in range(t) if (r * width) // t == w]
        a, b = rows[0], rows[-1] + 1
        stra = None
        for r in range(t):
            if r * width < w * t < r * width + width:
                stra = r
        wins.append((a, b, stra))
    return wins


def _or_reduce(y, axis):
    return jax.lax.reduce(y, y.dtype.type(0),
                          lambda a, b: jnp.bitwise_or(a, b), (axis,))


def pack_win(x, width, dtype, relayout=_row_major, reduce_kind="or"):
    t, nl, row_of_group, sh, straddle, shr = _consts(width, dtype)
    np_dt = layout.np_dtype(dtype)
    b = x.shape[0]
    mask = np_dt.type((1 << width) - 1)
    xm = x & mask
    y1 = xm << jnp.asarray(sh.astype(np_dt))
    y1r = relayout(y1.reshape(b, t, nl), dtype)
    if straddle.any():
        y2 = jnp.where(jnp.asarray(straddle),
                       xm >> jnp.asarray(np.where(straddle, shr, 0).astype(np_dt)),
                       np_dt.type(0))
        y2r = relayout(y2.reshape(b, t, nl), dtype)
    words = []
    for a, bb, stra in _windows(width, t):
        if reduce_kind == "or":
            wvec = _or_reduce(y1r[:, a:bb, :], 1)
        else:
            wvec = jnp.sum(y1r[:, a:bb, :], axis=1, dtype=y1r.dtype)
        if stra is not None:
            wvec = wvec | y2r[:, stra, :]
        words.append(wvec)
    return jnp.concatenate(words, axis=-1)


def pack_dot(x, width, dtype):
    """Segment reduction via MXU einsum on 16-bit planes."""
    t, nl, row_of_group, sh, straddle, shr = _consts(width, dtype)
    np_dt = layout.np_dtype(dtype)
    tbits = layout.bit_width(dtype)
    b = x.shape[0]
    mask = np_dt.type((1 << width) - 1)
    xm = x & mask
    y1 = (xm << jnp.asarray(sh.astype(np_dt))).reshape(b, t, nl)
    has_stra = bool(straddle.any())
    if has_stra:
        y2 = jnp.where(jnp.asarray(straddle),
                       xm >> jnp.asarray(np.where(straddle, shr, 0).astype(np_dt)),
                       np_dt.type(0)).reshape(b, t, nl)
    # destination matrices in GROUP space (no relayout needed: sum is
    # order-free): M1[w, g] = 1 iff row_of_group[g] lands its lo bits in w
    M1 = np.zeros((width, t), np.float32)
    M2 = np.zeros((width, t), np.float32)
    for g in range(t):
        r = row_of_group[g]
        M1[(r * width) // tbits, g] = 1.0
        if straddle[layout.row_offset(int(r)) // nl * nl]:
            M2[(r * width) // tbits + 1, g] = 1.0
    planes = max(1, tbits // 16)
    out = None
    for i in range(planes):
        p1 = y1 if planes == 1 else ((y1 >> np_dt.type(i * 16)) & np_dt.type(0xFFFF))
        acc = jnp.einsum("wg,bgl->bwl", jnp.asarray(M1), p1.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        if has_stra:
            p2 = y2 if planes == 1 else ((y2 >> np_dt.type(i * 16)) & np_dt.type(0xFFFF))
            acc = acc + jnp.einsum("wg,bgl->bwl", jnp.asarray(M2),
                                   p2.astype(jnp.float32),
                                   preferred_element_type=jnp.float32)
        acc = acc.astype(np_dt)
        out = acc if out is None else out | (acc << np_dt.type(i * 16))
    return out.reshape(b, width * nl)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16384)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--dtypes", default="u32")
    ap.add_argument("--widths", default="")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    n_blocks = args.blocks if platform == "tpu" else 64
    K = args.k if platform == "tpu" else 2
    rng = np.random.default_rng(0)

    def chained(fn, main, iters=5):
        @jax.jit
        def rep(x):
            def body(c, _):
                out = fn(jnp.bitwise_xor(x, c))
                out = jax.lax.optimization_barrier(out)
                flat = out.reshape(-1)
                np_dt = np.dtype(str(flat.dtype))
                top = np_dt.type(np.iinfo(np_dt).max)
                nc = jnp.where(flat[0] < top, 0, 1)
                return nc.astype(x.dtype), ()
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=K)
            return c
        _ = np.asarray(rep(main))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _ = np.asarray(rep(main))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / K

    for dt in args.dtypes.split(","):
        t = layout.bit_width(dt)
        np_dt = layout.np_dtype(dt)
        widths = ([int(w) for w in args.widths.split(",") if w]
                  or sorted({1, 3, t // 4, t // 2 + 1, t - 7, t - 2}))
        widths = [w for w in widths if 1 <= w < t]
        for w in widths:
            values = rng.integers(0, 1 << min(w, t), (n_blocks, 1024),
                                  dtype=np.uint64).astype(np_dt)
            want = ref.pack(values, w, dt)
            x = jax.block_until_ready(jnp.asarray(values))
            n_ints = n_blocks * 1024
            cands = {
                "slices": lambda v: ops_bitpack.pack(v, w, dt),
                "win": lambda v: pack_win(v, w, dt, _row_major),
                "winb": lambda v: pack_win(v, w, dt, _row_major_bitrev),
                "winsum": lambda v: pack_win(v, w, dt, _row_major_bitrev,
                                             reduce_kind="sum"),
                "dot": lambda v: pack_dot(v, w, dt),
            }
            rec = {}
            for name, fn in cands.items():
                try:
                    got = np.asarray(jax.jit(fn)(x))
                except Exception as e:
                    rec[name] = f"ERR {str(e)[:60]}"
                    continue
                if not np.array_equal(got, want):
                    rec[name] = "WRONG"
                    continue
                try:
                    t_s = chained(fn, x)
                    rec[name] = round(n_ints / t_s / 1e9, 2)
                except Exception as e:  # pragma: no cover
                    rec[name] = f"ERR {str(e)[:60]}"
            print(json.dumps({"op": "pack_producer", "dt": dt, "w": w,
                              "Gints_per_s": rec}), flush=True)


if __name__ == "__main__":
    main()
