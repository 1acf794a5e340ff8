"""Pallas TPU kernels: the hand-scheduled fast path for the FastLanes codecs.

TPU-native design (BASELINE.json north star; not a port of the Rust loops):

  * One grid step processes a tile of TILE_B blocks. The (TILE_B, 1024)
    values tile lives in VMEM; because each transposed row is a contiguous
    lane slice of the flat block (core/layout.py), the whole pack/unpack row
    pipeline is static lane slices + shifts/masks on (TILE_B, LANES) vregs —
    register-resident, no gathers, no HBM round-trips between rows
    (the reference's per-lane SIMD loop mapped onto the VPU's (8,128) lanes,
    reference macros.rs:67-69 / bitpacking.rs:69).

  * u8/u16 compute in the uint32 domain (TPU vregs are 32-bit); stores
    truncate back, which matches mod-2^T wrapping exactly. u64 runs as
    2x32-bit limb pairs (no 64-bit vector ints on TPU).

  * The row loops are the *same code* as the XLA ops layer
    (ops.bitpack.pack_words / unpack_row_stream) traced inside the kernel —
    one semantics implementation, two execution strategies.

  * Fused codecs (undelta_pack, unfor_pack, delta_pack, for_pack) extend the
    row stream exactly like reference delta.rs:48-63 / ffor.rs:24-50.

Batch entry points fall back to the XLA ops path off-TPU (CPU tests run the
kernels in interpreter mode explicitly)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import layout
from ..ops import _engine as eng
from ..ops import bitpack as ops_bitpack
from ..ops.bitpack import assemble_blocks, pack_words, unpack_row_stream

# Tile of blocks per grid step. 128 blocks x 4KB = 512KB values tile for u32;
# fits VMEM with headroom for the packed tile, the row-scratch planes (which
# pad LANES up to 128 physical lanes) and pipeline double-buffering. u64 uses
# a smaller tile: 2 limb arrays x 64 rows of (tile, 16->128-padded) scratch.
DEFAULT_TILE_B = 512
_TILE_BY_DTYPE = {"u8": 512, "u16": 512, "u32": 512, "u64": 32}


def default_tile(dtype):
    return _TILE_BY_DTYPE[layout.canon_dtype(dtype)]


def _compute_jnp_dtype(dtype):
    """In-kernel compute dtype: uint32 domain for u8/u16/u32 (vregs are
    32-bit); u64 handled as limb tuples elsewhere."""
    return jnp.uint32


def _load(ref_or_refs, dtype):
    if eng.is_limb(dtype):
        lo_ref, hi_ref = ref_or_refs
        return lo_ref[...], hi_ref[...]
    arr = ref_or_refs[...]
    if arr.dtype != jnp.uint32:
        arr = arr.astype(jnp.uint32)
    return arr


def _store(ref_or_refs, vec, dtype):
    if eng.is_limb(dtype):
        lo_ref, hi_ref = ref_or_refs
        lo_ref[...] = vec[0]
        hi_ref[...] = vec[1]
    else:
        want = eng.jnp_dtype(dtype)
        ref_or_refs[...] = vec if vec.dtype == want else vec.astype(want)


def _row_fn(vec, dtype):
    nl = layout.lanes(dtype)
    return lambda row: eng.cols(vec, layout.row_offset(row), nl, dtype)


# ---------------------------------------------------------------------------
# kernel bodies (shared row-pipeline, differing sources/sinks)


def _split_refs(refs, dtype, n_scratch):
    """refs layout: inputs..., [extras...], outputs..., scratches..."""
    n = 2 if eng.is_limb(dtype) else 1
    body, scratch = refs[:len(refs) - n_scratch], refs[len(refs) - n_scratch:]
    main = body[:n] if n == 2 else body[0]
    extra = body[n:-n]
    out = body[-n:] if n == 2 else body[-1]
    return main, extra, out, scratch


def _scratch_write(scratch, row, vec, dtype):
    if eng.is_limb(dtype):
        scratch[0][row] = vec[0]
        scratch[1][row] = vec[1]
    else:
        scratch[0][row] = vec


def _scratch_read(scratch, row, dtype):
    if eng.is_limb(dtype):
        return scratch[0][row], scratch[1][row]
    return scratch[0][row]


# NOTE on the scratch staging: Mosaic (remote-compile v5e toolchain) miscompiles
# long shift/or/add chains whose operands are lane-slices with *different*
# rotation offsets (off % 128) — see tools/validate_tpu.py (compiled-vs-oracle
# sweep that catches this class of miscompile on the real chip) and the repro
# history in kernels/MOSAIC_NOTES.md. Writing each transposed row through a
# VMEM scratch plane re-aligns every operand to lane 0 and fences the bad
# fusion. VMEM bandwidth makes the extra round-trip ~free vs HBM.


def _n_words(width, dtype):
    """Number of LANES-wide word groups in the packed layout."""
    return layout.packed_len(dtype, width) // layout.lanes(dtype)


# ---------------------------------------------------------------------------
# wide (grouped-rows) decode: full 128-lane VPU utilization for nl < 128
#
# MEASURED SLOWER compiled (v5e: u32 W=3 decode 29.8e9 vs 44.2e9 ints/s at
# tile_b=128) — Mosaic lowers the lane-concats and per-lane vector shifts
# through relayouts that cost more than the 4x lane-utilization win. Kept
# (bit-exact, covered by interpret tests when enabled) as the documented
# experiment; see MOSAIC_NOTES.md.
_WIDE_DECODE = os.environ.get("FASTLANES_WIDE_DECODE", "0") == "1"

# Decode row-plane staging: True routes unpacked rows through VMEM scratch
# before the hook/assemble stage (historically paired with the word staging);
# False feeds them straight into assemble. Toggled for measurement; the word
# staging (the actual Mosaic miscompile fix) is unconditional.
_STAGE_ROWS = os.environ.get("FASTLANES_STAGE_ROWS", "0") == "1"

# Decode word staging: unpack's shift/or chains have at most TWO sources
# (curr word, next word) — below the >=4 mixed-rotation terms the Mosaic
# miscompile repro needs (MOSAIC_NOTES.md) — so direct packed-tile slices
# may be safe for decode. Toggled for measurement; pack always stages.
_STAGE_WORDS = os.environ.get("FASTLANES_STAGE_WORDS", "1") == "1"
#
# A (tile_b, LANES) row op uses only LANES of the VPU's 128 lanes (25% for
# u32, 50% for u16). Every unpack row is the same two-term formula with
# row-constant words/shifts/masks:
#     out[r] = ((word[w1] >> s1) & m1) | ((word[w2] & m2) << s2)
# so G = 128 // LANES rows fuse into ONE (tile_b, 128) op whose shift/mask
# operands are per-lane constant vectors (Mosaic vector shifts). Sources are
# concatenations of aligned scratch word planes; results are sliced back out
# to aligned row planes. u64 (limb pairs) keeps the scalar-row path.


def _wide_row_params(width, dtype):
    """Per-row (w1, shift, w2, has_stitch) of the unpack formula
    (reference macros.rs:142-170 restated as a uniform two-term extract):
        out[r] = ((word[w1] >> s1) & m1) | ((word[w2] & m2) << s2)
    with s1 = (r*W) %% T, m1 = (1 << min(W, T-s1)) - 1,
    rem = max(s1+W-T, 0), m2 = (1 << rem) - 1, s2 = T - s1."""
    t = layout.bit_width(dtype)
    rows = []
    for row in range(t):
        cw = (row * width) // t
        shift = (row * width) % t
        nxt = ((row + 1) * width) // t
        rem = ((row + 1) * width) % t
        if nxt > cw and rem:  # stitch: high bits come from word nxt
            rows.append((cw, shift, nxt, True))
        else:
            rows.append((cw, shift, cw, False))
    return rows


def _unpack_rows_wide(get_word, set_row, width, dtype):
    """Stage-1 replacement: decode G = 128//LANES consecutive rows per
    128-lane vector op. The per-lane shift/mask vectors are computed from a
    lane iota (Pallas kernels cannot capture vector constants), exploiting
    that s1 is affine in the lane-group index: s1 = W*(g0 + lane//nl) mod T."""
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    G = 128 // nl
    params = _wide_row_params(width, dtype)
    mask_w = jnp.uint32((1 << width) - 1)
    # lane-group index g in [0, G): (1, 128) so every op below broadcasts.
    # Mask algebra keeps every mask a shift of mask_w (this Mosaic toolchain
    # does not legalize vector minui): with rem = max(s1 + W - T, 0):
    #   m1 = mask(W - rem)      = mask_w >> rem
    #   s2 = W - rem            (current_bits)
    #   m2 = mask(rem)          = mask_w >> s2
    gidx = (jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1) >> (nl.bit_length() - 1))
    w_gidx = gidx * jnp.uint32(width)
    for g0 in range(0, t, G):
        grp = params[g0:g0 + G]
        s1 = (w_gidx + jnp.uint32(g0 * width)) & jnp.uint32(t - 1)
        rem = jnp.where(s1 > jnp.uint32(t - width),
                        s1 - jnp.uint32(t - width), jnp.uint32(0))
        src1 = jnp.concatenate([get_word(p[0]) for p in grp], axis=-1)
        a = (src1 >> s1) & (mask_w >> rem)
        if any(p[3] for p in grp):
            s2 = jnp.uint32(width) - rem
            src2 = jnp.concatenate([get_word(p[2]) for p in grp], axis=-1)
            a = a | ((src2 & (mask_w >> s2)) << s2)
        for j in range(G):
            set_row(g0 + j, a[..., j * nl:(j + 1) * nl])


def _unpack_body(width, dtype, post_row=None):
    """Decode: stage packed words into aligned scratch planes, run the row
    pipeline from there, stage rows, apply the fusion hook chain, assemble.
    post_row(row_vec, state) -> (out_vec, state)."""
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    nw = _n_words(width, dtype)
    n_arrs = 2 if eng.is_limb(dtype) else 1

    def kernel(*refs):
        n_scr = n_arrs * ((1 if _STAGE_WORDS else 0) + (1 if _STAGE_ROWS else 0))
        packed, extra, out, scratch = _split_refs(refs, dtype, n_scr)
        p = _load(packed, dtype)
        if _STAGE_WORDS:
            word_scr, row_scr = scratch[:n_arrs], scratch[n_arrs:]
            # stage 0: materialize each packed word at lane rotation 0
            for w in range(nw):
                _scratch_write(word_scr, w, eng.cols(p, nl * w, nl, dtype), dtype)
            get_word = lambda w: _scratch_read(word_scr, w, dtype)  # noqa: E731
        else:
            row_scr = scratch
            get_word = lambda w: eng.cols(p, nl * w, nl, dtype)  # noqa: E731
        state = _load_extra(extra, dtype) if extra else None
        if _STAGE_ROWS:
            # stage 1: unpack rows (operands all aligned) into row planes.
            # (A grouped-rows variant that fills all 128 VPU lanes per op
            # exists as _unpack_rows_wide but measured ~1.5x SLOWER compiled
            # — see MOSAIC_NOTES.md; enable via _WIDE_DECODE.)
            if _WIDE_DECODE and n_arrs == 1 and nl < 128 and 0 < width < t:
                _unpack_rows_wide(
                    get_word, lambda r, v: _scratch_write(row_scr, r, v, dtype),
                    width, dtype)
            else:
                for row, elem in unpack_row_stream(None, width, dtype, get_word=get_word):
                    _scratch_write(row_scr, row, elem, dtype)
            # stage 2: fusion hook chain + assemble
            rows = {}
            for row in range(t):
                elem = _scratch_read(row_scr, row, dtype)
                if post_row is not None:
                    elem, state = post_row(elem, state)
                rows[row] = elem
        else:
            # direct: rows flow from the (aligned) word planes straight into
            # the hook chain + assemble concat — no row-plane round trip.
            # Safe per MOSAIC_NOTES.md: the miscompile needs mixed-rotation
            # *operands* in shift/or chains; here every operand is aligned
            # and only the final concat rotates (materialized values).
            rows = {}
            for row, elem in unpack_row_stream(None, width, dtype, get_word=get_word):
                if post_row is not None:
                    elem, state = post_row(elem, state)
                rows[row] = elem
        _store(out, assemble_blocks(rows, dtype), dtype)

    return kernel


def _pack_body(width, dtype, pre_row=None):
    """Encode: extract rows (+hook) -> scratch planes -> word construction.
    pre_row(row_vec, state) -> (row_vec, state)."""
    t = layout.bit_width(dtype)

    def kernel(*refs):
        vals, extra, out, scratch = _split_refs(refs, dtype, 2 if eng.is_limb(dtype) else 1)
        v = _load(vals, dtype)
        state = _load_extra(extra, dtype) if extra else None
        src = _row_fn(v, dtype)
        for row in range(t):
            elem = src(row)
            if pre_row is not None:
                elem, state = pre_row(elem, state)
            _scratch_write(scratch, row, elem, dtype)
        words = pack_words(lambda r: _scratch_read(scratch, r, dtype), width, dtype, None)
        _store(out, eng.concat_cols(words, dtype), dtype)

    return kernel


def _load_extra(extra_refs, dtype):
    """Load the fusion parameter in compute dtype: delta base (B, LANES) from
    VMEM, or the scalar FoR reference from SMEM (a (1, 1) ref read as a
    scalar — Mosaic cannot broadcast a vector in both sublanes and lanes)."""
    if eng.is_limb(dtype):
        a, b = extra_refs
        if a.shape == (1, 1):
            return a[0, 0], b[0, 0]
        return a[...], b[...]
    ref = extra_refs[0]
    if ref.shape == (1, 1):
        val = ref[0, 0]
        return val.astype(jnp.uint32) if val.dtype != jnp.uint32 else val
    arr = ref[...]
    return arr.astype(jnp.uint32) if arr.dtype != jnp.uint32 else arr


# fusion hooks ---------------------------------------------------------------


def _undelta_hook(dtype):
    def post_row(elem, prev):
        nxt = eng.add(elem, prev, dtype)
        return nxt, nxt

    return post_row


def _unzigzag_vec(elem, dtype):
    """zigzag code -> two's-complement delta bits: v = (u >> 1) ^ -(u & 1),
    in the kernel's uint32 compute domain (high garbage bits truncate at
    store, which is mod-2^T correct). Aligned operands only."""
    if eng.is_limb(dtype):
        from .. import transforms

        return transforms.zigzag_decode_limb(*elem)
    one = elem.dtype.type(1)
    return (elem >> one) ^ (elem.dtype.type(0) - (elem & one))


def _unzdelta_hook(dtype):
    """Fused zdelta decode: unzigzag each unpacked row, then prefix-sum —
    the zdelta analogue of reference delta.rs:48-63's fusion."""
    def post_row(elem, prev):
        nxt = eng.add(_unzigzag_vec(elem, dtype), prev, dtype)
        return nxt, nxt

    return post_row


def _delta_hook(dtype):
    def pre_row(elem, prev):
        return eng.sub(elem, prev, dtype), elem

    return pre_row


def _unfor_hook(dtype):
    def post_row(elem, ref):
        return eng.add(elem, ref, dtype), ref

    return post_row


def _for_hook(dtype):
    def pre_row(elem, ref):
        return eng.sub(elem, ref, dtype), ref

    return pre_row


# ---------------------------------------------------------------------------
# pallas_call builders


def _io_dtype(dtype):
    return jnp.uint32 if eng.is_limb(dtype) else eng.jnp_dtype(dtype)


def _specs(n_cols, tile_b):
    return pl.BlockSpec((tile_b, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _param_spec(shape, tile_b, smem=False):
    # replicated parameter (base/reference): same block for every grid step;
    # scalar references live in SMEM (read as scalars inside the kernel)
    space = pltpu.SMEM if smem else pltpu.VMEM
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=space)


@functools.lru_cache(maxsize=None)
def _build_call(op: str, dtype: str, width: int, tile_b: int, n_tiles: int,
                interpret: bool, param_kind: str,
                staging: tuple = None):
    """Build the pallas_call for (op, dtype, width) over a padded batch of
    n_tiles * tile_b blocks. `staging` keys the cache on the module staging
    flags (the kernel body + scratch shapes snapshot them — toggling the
    flags must not hit stale entries). param_kind: '', 'base' (per-lane, replicated
    across blocks) or 'ref' (scalar FoR reference as (1,1))."""
    dtype = layout.canon_dtype(dtype)
    t = layout.bit_width(dtype)
    nl = layout.lanes(dtype)
    plen = layout.packed_len(dtype, width)
    limb = eng.is_limb(dtype)
    io_dt = _io_dtype(dtype)

    decode = op in ("unpack", "undelta_pack", "unzdelta_pack", "unfor_pack")
    in_cols = plen if decode else layout.BLOCK
    out_cols = layout.BLOCK if decode else plen

    hooks = {
        "unpack": (None, None),
        "pack": (None, None),
        "undelta_pack": (_undelta_hook(dtype), None),
        "unzdelta_pack": (_unzdelta_hook(dtype), None),
        "unfor_pack": (_unfor_hook(dtype), None),
        "delta_pack": (None, _delta_hook(dtype)),
        "for_pack": (None, _for_hook(dtype)),
    }
    post_row, pre_row = hooks[op]
    body = (_unpack_body(width, dtype, post_row) if decode
            else _pack_body(width, dtype, pre_row))

    n_arrs = 2 if limb else 1
    in_specs = [_specs(in_cols, tile_b) for _ in range(n_arrs)]
    if param_kind == "base":
        in_specs += [_param_spec((tile_b, nl), tile_b) for _ in range(n_arrs)]
    elif param_kind == "base_b":  # per-block base rides the grid like the payload
        in_specs += [_specs(nl, tile_b) for _ in range(n_arrs)]
    elif param_kind == "ref":
        in_specs += [_param_spec((1, 1), tile_b, smem=True) for _ in range(n_arrs)]
    out_specs = tuple(_specs(out_cols, tile_b) for _ in range(n_arrs))
    out_shape = tuple(
        jax.ShapeDtypeStruct((n_tiles * tile_b, out_cols), io_dt) for _ in range(n_arrs))
    if n_arrs == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]

    # scratch planes (pad to 128 lanes physically): decode stages packed words
    # AND unpacked rows; encode stages rows only. See MOSAIC_NOTES.md.
    nw = layout.packed_len(dtype, width) // nl if width else 0
    scratch_shapes = []
    n_planes = 0
    if decode:
        if _STAGE_WORDS:
            scratch_shapes += [pltpu.VMEM((nw, tile_b, nl), jnp.uint32) for _ in range(n_arrs)]
            n_planes += nw
        if _STAGE_ROWS:
            scratch_shapes += [pltpu.VMEM((t, tile_b, nl), jnp.uint32) for _ in range(n_arrs)]
            n_planes += t
    else:
        scratch_shapes += [pltpu.VMEM((t, tile_b, nl), jnp.uint32) for _ in range(n_arrs)]
        n_planes = t

    vregs_bytes = tile_b * (in_cols + out_cols) * 4 * n_arrs
    if param_kind in ("base", "base_b"):  # base rides VMEM, lane-padded
        vregs_bytes += tile_b * max(nl, 128) * 4 * n_arrs
    scratch_bytes = n_planes * tile_b * max(nl, 128) * 4 * n_arrs
    return pl.pallas_call(
        body,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vregs_bytes * 3) + scratch_bytes + (4 << 20),
                                 120 * (1 << 20)),
        ),
    )


# ---------------------------------------------------------------------------
# batch entry points


def _split_limbs(arr):
    return arr[..., 0], arr[..., 1]


def _join_limbs(lo, hi):
    return jnp.stack([lo, hi], axis=-1)


def _pad_blocks(arr, tile_b):
    b = arr.shape[0]
    pad = (-b) % tile_b
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros((pad, *arr.shape[1:]), arr.dtype)], axis=0)
    return arr, b


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _normalize(arr, dtype):
    """Accept everything the ops layer accepts — batched or unbatched,
    native-width uint arrays, uint64 (x64 on), or (..., 2) uint32 limb
    images — and return the (B, cols[, 2]) uint form plus `had_batch`."""
    vec = eng.to_vec(arr, dtype)
    vec, had_batch = eng.promote_shape(vec, dtype)
    if eng.is_limb(dtype):
        return _join_limbs(vec[0], vec[1]), had_batch
    return vec, had_batch


def _denormalize(out, had_batch, dtype, like):
    if not had_batch:
        out = out[0]
    if eng.is_limb(dtype):
        return eng.from_vec((out[..., 0], out[..., 1]), dtype, like=like)
    return out


def _run(op, arrs, params, width, dtype, tile_b, interpret, join=True):
    """Common driver: pad, split limbs, call kernel, unpad, rejoin.
    join=False (u64 decode fast path) returns the kernel's separate
    (lo, hi) planes without the interleaving stack."""
    dtype = layout.canon_dtype(dtype)
    limb = eng.is_limb(dtype)
    tile_b = tile_b or default_tile(dtype)
    main, b = _pad_blocks(arrs, tile_b)
    n_tiles = main.shape[0] // tile_b

    call_inputs = list(_split_limbs(main)) if limb else [main]
    param_kind = ""
    if params is not None:
        kind, parr = params
        param_kind = kind
        if kind == "base_b":  # per-block base: pad + shard like the payload
            if parr.shape[0] != b:
                raise ValueError(
                    f"per-block base has {parr.shape[0]} rows for {b} blocks")
            parr, _ = _pad_blocks(parr, tile_b)
        if limb:
            if kind == "ref":
                call_inputs += [parr[..., 0].reshape(1, 1), parr[..., 1].reshape(1, 1)]
            else:
                call_inputs += list(_split_limbs(parr))
        else:
            call_inputs += [parr.reshape(1, 1) if kind == "ref" else parr]

    call = _build_call(op, dtype, width, tile_b, n_tiles, interpret, param_kind,
                       (_STAGE_WORDS, _STAGE_ROWS, _WIDE_DECODE))
    out = call(*call_inputs)
    if limb:
        if not join:
            return out[0][:b], out[1][:b]
        out = _join_limbs(out[0], out[1])
    return out[:b]


def _prep_base(base, dtype, tile_b):
    """base: per-lane seed vector(s) (reference's &[T; LANES], delta.rs:7).
    Returns (param_kind, array): a shared (LANES,) base is broadcast to one
    replicated (tile_b, LANES) block ('base'); a per-block (B, LANES) base is
    passed through to be block-sharded alongside the payload ('base_b')."""
    nl = layout.lanes(dtype)
    vec = jnp.asarray(base)
    if eng.is_limb(dtype):
        if vec.shape == (nl, 2):
            return "base", jnp.broadcast_to(vec[None], (tile_b, nl, 2))
        if vec.ndim == 3 and vec.shape[1:] == (nl, 2):
            return "base_b", vec
        raise ValueError(
            f"base must be ({nl}, 2) shared or (B, {nl}, 2) per-block limb "
            f"image, got {vec.shape}")
    if vec.shape == (nl,):
        return "base", jnp.broadcast_to(vec[None], (tile_b, nl))
    if vec.ndim == 2 and vec.shape[1] == nl:
        return "base_b", vec
    raise ValueError(f"base must be ({nl},) shared or (B, {nl}) per-block, got {vec.shape}")


def _prep_ref(reference, dtype):
    if eng.is_limb(dtype):
        if isinstance(reference, int):
            return jnp.array([[reference & 0xFFFFFFFF, (reference >> 32) & 0xFFFFFFFF]],
                             jnp.uint32).reshape(1, 2)
        return jnp.asarray(reference, jnp.uint32).reshape(1, 2)
    if isinstance(reference, (int, np.integer)):
        # host int: numpy conversion wraps mod 2^T like the Rust reference
        return jnp.asarray(np.asarray(reference, layout.np_dtype(dtype))).reshape(1, 1)
    # already an array (possibly a tracer inside shard_map) — stay in-graph
    return jnp.asarray(reference).astype(eng.jnp_dtype(dtype)).reshape(1, 1)


def _maybe_fallback(interpret):
    """Kernels need a TPU unless interpret mode is forced."""
    if interpret is None:
        if _on_tpu():
            return False, False  # run compiled
        return True, None  # fall back to ops
    return False, interpret


def _route(op, width, dtype, interpret):
    """Pick the execution strategy for a public entry point.

    Returns (use_ops, interp): `interpret=True/False` forces the kernel
    (interpret / compiled); `interpret=None` (auto) takes the measured
    fastest path from kernels.routing on TPU and the ops path elsewhere.
    This is what makes the default path the fastest path per config —
    the reference's raison d'être (reference README.md:5-10)."""
    if interpret is not None:
        return False, interpret
    if not _on_tpu():
        return True, None
    from . import routing

    if routing.use_pallas(op, layout.canon_dtype(dtype), width):
        return False, False
    return True, None


def pack(values, width, dtype, *, tile_b=None, interpret=None):
    """BitPacking::pack over a batch: (B, 1024) -> (B, plen).

    Accepts the same input forms as the ops layer (batched or unbatched,
    uint64 or (..., 2) uint32 limb image for u64); output mirrors the
    input convention. interpret=None routes to the measured fastest path
    (kernels.routing); interpret=True/False forces the kernel."""
    use_ops, interp = _route("pack", width, dtype, interpret)
    if use_ops:
        return ops_bitpack.pack(values, width, dtype)
    main, had_batch = _normalize(values, dtype)
    if width == 0:
        return _denormalize(_empty_packed(main, dtype), had_batch, dtype, values)
    out = _run("pack", main, None, width, dtype, tile_b, interp)
    return _denormalize(out, had_batch, dtype, values)


def _plane_result(out, had_batch):
    lo, hi = out
    if not had_batch:
        lo, hi = lo[0], hi[0]
    return lo, hi


def unpack(packed, width, dtype, *, tile_b=None, interpret=None, planes=False):
    """planes=True (u64 only): return separate (lo, hi) uint32 planes —
    the fast device form (skips the interleaving stack, +57% on v5e)."""
    if planes and not eng.is_limb(dtype):
        raise ValueError("planes=True is the u64 limb-plane API")
    use_ops, interp = _route("unpack", width, dtype, interpret)
    if use_ops:
        return ops_bitpack.unpack(packed, width, dtype, planes=planes)
    main, had_batch = _normalize(packed, dtype)
    if width == 0:
        out = _zero_blocks(main, dtype)
        if planes:
            return _plane_result(_split_limbs(out), had_batch)
        return _denormalize(out, had_batch, dtype, packed)
    out = _run("unpack", main, None, width, dtype, tile_b, interp,
               join=not planes)
    if planes:
        return _plane_result(out, had_batch)
    return _denormalize(out, had_batch, dtype, packed)


def undelta_pack(packed, base, width, dtype, *, tile_b=None, interpret=None,
                 planes=False):
    if planes and not eng.is_limb(dtype):
        raise ValueError("planes=True is the u64 limb-plane API")
    use_ops, interp = _route("undelta_pack", width, dtype, interpret)
    if use_ops or width == 0:
        from ..ops import delta as ops_delta

        return ops_delta.undelta_pack(packed, base, width, dtype, planes=planes)
    tile = tile_b or default_tile(dtype)
    main, had_batch = _normalize(packed, dtype)
    out = _run("undelta_pack", main, _prep_base(base, dtype, tile),
               width, dtype, tile, interp, join=not planes)
    if planes:
        return _plane_result(out, had_batch)
    return _denormalize(out, had_batch, dtype, packed)


def unzdelta_pack(packed, base, width, dtype, *, tile_b=None, interpret=None,
                  planes=False):
    """Fused zdelta decode: unpack -> unzigzag -> per-lane prefix-sum in one
    kernel pass (the zdelta twin of undelta_pack)."""
    if planes and not eng.is_limb(dtype):
        raise ValueError("planes=True is the u64 limb-plane API")
    use_ops, interp = _route("unzdelta_pack", width, dtype, interpret)
    if use_ops or width == 0:
        from .. import transforms as _tr
        from ..ops import delta as ops_delta

        if eng.is_limb(dtype):
            zlo, zhi = ops_bitpack.unpack(packed, width, dtype, planes=True)
            deltas = _tr.zigzag_decode_limb(zlo, zhi)
            lo, hi = ops_delta.undelta(deltas, base, dtype, planes=True)
            if planes:
                return lo, hi
            return eng.from_vec((lo, hi), dtype, like=packed)
        zz = jnp.asarray(ops_bitpack.unpack(packed, width, dtype))
        t = layout.bit_width(dtype)
        deltas = jax.lax.bitcast_convert_type(
            _tr.zigzag_decode(zz), jnp.dtype(f"uint{t}"))
        return ops_delta.undelta(deltas, base, dtype)
    tile = tile_b or default_tile(dtype)
    main, had_batch = _normalize(packed, dtype)
    out = _run("unzdelta_pack", main, _prep_base(base, dtype, tile),
               width, dtype, tile, interp, join=not planes)
    if planes:
        return _plane_result(out, had_batch)
    return _denormalize(out, had_batch, dtype, packed)


def delta_pack(values, base, width, dtype, *, tile_b=None, interpret=None):
    use_ops, interp = _route("delta_pack", width, dtype, interpret)
    if use_ops:
        from ..ops import delta as ops_delta

        return ops_delta.delta_pack(values, base, width, dtype)
    tile = tile_b or default_tile(dtype)
    main, had_batch = _normalize(values, dtype)
    if width == 0:
        return _denormalize(_empty_packed(main, dtype), had_batch, dtype, values)
    out = _run("delta_pack", main, _prep_base(base, dtype, tile),
               width, dtype, tile, interp)
    return _denormalize(out, had_batch, dtype, values)


def unfor_pack(packed, reference, width, dtype, *, tile_b=None, interpret=None,
               planes=False):
    if planes and not eng.is_limb(dtype):
        raise ValueError("planes=True is the u64 limb-plane API")
    use_ops, interp = _route("unfor_pack", width, dtype, interpret)
    if use_ops or width == 0:
        from ..ops import ffor as ops_ffor

        return ops_ffor.unfor_pack(packed, reference, width, dtype, planes=planes)
    main, had_batch = _normalize(packed, dtype)
    out = _run("unfor_pack", main, ("ref", _prep_ref(reference, dtype)),
               width, dtype, tile_b, interp, join=not planes)
    if planes:
        return _plane_result(out, had_batch)
    return _denormalize(out, had_batch, dtype, packed)


def pack_map(fn, values, width, dtype):
    """Fused-encode entry: pack with an elementwise producer applied per
    row-slice read (see ops.bitpack.pack_map). Always the XLA-ops path —
    encode routes to ops on every measured config (kernels/routing_tpu.json;
    the Pallas pack kernel loses the encode race), and a Python producer
    fuses naturally only in the ops trace."""
    return ops_bitpack.pack_map(fn, values, width, dtype)


# -- original-order decode (untranspose fused into decode; VERDICT r2
#    item 1). FLT delta/zdelta/rle chunks store transposed blocks; these
#    entries return ORIGINAL order directly. Two strategies, measured per
#    (op, dtype, width) like pallas-vs-ops: 'od' = output-domain decode
#    (ops/orig.py — no transposed image ever materialized), 'compose' =
#    routed transposed decode + standalone untranspose. u64 always
#    composes in the (lo, hi) plane domain.


_ORIG_STRATEGIES = ("od", "gat", "rep", "compose", "composeo")


def _route_orig(op, width, dtype, strategy):
    if strategy is not None:
        if strategy not in _ORIG_STRATEGIES:
            raise ValueError(
                f"strategy must be one of {_ORIG_STRATEGIES}, got {strategy!r}")
        return strategy
    from . import routing

    return routing.best_path(op, layout.canon_dtype(dtype), width)


def _orig_entry(op, decode_fn, od_fn, packed, width, dtype, strategy,
                interpret, planes, ops_decode_fn=None):
    """Shared driver for the *_orig entries: route the fused formulations
    (od/gat/rep, ops/orig.py) vs compose (routed transposed decode +
    standalone untranspose) vs composeo (forced XLA-ops decode: XLA can
    fuse the untranspose into the transparent ops trace — measured +17%
    at u32 W=25 — but not into an opaque Pallas kernel, so the two
    compose flavors race per config); u64 runs in the (lo, hi) plane
    domain either way (planes=False interleaves at the end for the
    byte-image convention; composeo falls back to the routed decode
    there). An explicit `interpret` forces the kernel decode, which only
    exists on the compose strategies."""
    from ..ops import transpose as transpose_mod

    if interpret is not None and strategy is None:
        strategy = "compose"
    dtype = layout.canon_dtype(dtype)
    strat = _route_orig(op, width, dtype, strategy)
    if eng.is_limb(dtype):
        if strat not in ("compose", "composeo"):
            out = od_fn(strat)
        else:
            out = transpose_mod.untranspose(decode_fn(), dtype, planes=True)
        if planes:
            return out
        return eng.from_vec(out, dtype, like=packed)
    if planes:
        raise ValueError("planes=True is the u64 limb-plane API")
    if strat == "composeo" and ops_decode_fn is not None and interpret is None:
        return transpose_mod.untranspose(ops_decode_fn(), dtype)
    if strat not in ("compose", "composeo"):
        return od_fn(strat)
    return transpose_mod.untranspose(decode_fn(), dtype)


def unpack_orig(packed, width, dtype, *, strategy=None, interpret=None,
                planes=False):
    """unpack straight to original order (macros.rs:101-174 composed with
    transpose.rs:18-22 in one pass)."""
    from ..ops import orig as ops_orig

    return _orig_entry(
        "unpack_orig",
        lambda: unpack(packed, width, dtype, interpret=interpret,
                       planes=eng.is_limb(dtype)),
        lambda f: ops_orig.unpack_orig(packed, width, dtype, formulation=f),
        packed, width, dtype, strategy, interpret, planes,
        ops_decode_fn=lambda: ops_bitpack.unpack(packed, width, dtype))


def undelta_pack_orig(packed, base, width, dtype, *, strategy=None,
                      interpret=None, planes=False):
    """Fused delta decode straight to original order (delta.rs:48-63
    composed with transpose.rs:18-22) — the sorted-column file-read path."""
    from ..ops import orig as ops_orig

    def _ops_undelta():
        from ..ops import delta as ops_delta

        return ops_delta.undelta_pack(packed, base, width, dtype)

    return _orig_entry(
        "undelta_pack_orig",
        lambda: undelta_pack(packed, base, width, dtype, interpret=interpret,
                             planes=eng.is_limb(dtype)),
        lambda f: ops_orig.undelta_pack_orig(packed, base, width, dtype,
                                             formulation=f),
        packed, width, dtype, strategy, interpret, planes,
        ops_decode_fn=_ops_undelta)


def unzdelta_pack_orig(packed, base, width, dtype, *, strategy=None,
                       interpret=None, planes=False):
    """Fused zdelta decode straight to original order."""
    from ..ops import orig as ops_orig

    def _ops_unzdelta():
        from ..parallel.shard import _ops_unzdelta_pack

        return _ops_unzdelta_pack(packed, base, width, dtype)

    return _orig_entry(
        "unzdelta_pack_orig",
        lambda: unzdelta_pack(packed, base, width, dtype, interpret=interpret,
                              planes=eng.is_limb(dtype)),
        lambda f: ops_orig.unzdelta_pack_orig(packed, base, width, dtype,
                                              formulation=f),
        packed, width, dtype, strategy, interpret, planes,
        ops_decode_fn=_ops_unzdelta)


def delta_pack_orig(values, width, dtype, *, zigzag=False, strategy=None,
                    interpret=None):
    """ENCODE dual: ORIGINAL-order values -> (packed, base) for the
    delta/zdelta wire format. 'od' (default) traces transpose + delta
    (+ zigzag) + pack in one pass with no transposed image (the device
    encode previously paid a standalone ~22.8e9 ints/s transpose first);
    'compose' materializes the transpose and uses the routed stages."""
    dtype = layout.canon_dtype(dtype)
    op = "zdelta_pack_orig_enc" if zigzag else "delta_pack_orig_enc"
    if _route_orig(op, width, dtype, strategy) == "od":
        from ..ops import orig as ops_orig

        return ops_orig.delta_pack_orig(values, width, dtype, zigzag=zigzag)
    from .. import transforms as _tr
    from ..ops import delta as ops_delta
    from ..ops import transpose as transpose_mod

    nl = layout.lanes(dtype)
    tr = jnp.asarray(transpose_mod.transpose(values, dtype))
    # slice the POSITION axis: axis 0 when unbatched (or an unbatched u64
    # limb image, whose trailing axis is the limb pair)
    pos_axis0 = tr.ndim == 1 or (eng.is_limb(dtype) and tr.ndim == 2
                                 and tr.dtype == jnp.uint32)
    base = tr[:nl] if pos_axis0 else tr[:, :nl]
    if not zigzag:
        return delta_pack(tr, base, width, dtype, interpret=interpret), base
    deltas = ops_delta.delta(tr, base, dtype)
    arr = jnp.asarray(deltas)
    if eng.is_limb(dtype) and arr.dtype == jnp.uint32:
        zz = jnp.stack(_tr.zigzag_encode_limb(arr[..., 0], arr[..., 1]), -1)
    else:
        t = layout.bit_width(dtype)
        zz = _tr.zigzag_encode(
            jax.lax.bitcast_convert_type(arr, jnp.dtype(f"int{t}")))
    return pack(zz, width, dtype, interpret=interpret), base


def for_pack(values, reference, width, dtype, *, tile_b=None, interpret=None):
    use_ops, interp = _route("for_pack", width, dtype, interpret)
    if use_ops:
        from ..ops import ffor as ops_ffor

        return ops_ffor.for_pack(values, reference, width, dtype)
    main, had_batch = _normalize(values, dtype)
    if width == 0:
        return _denormalize(_empty_packed(main, dtype), had_batch, dtype, values)
    out = _run("for_pack", main, ("ref", _prep_ref(reference, dtype)),
               width, dtype, tile_b, interp)
    return _denormalize(out, had_batch, dtype, values)


def _empty_packed(main, dtype):
    b = main.shape[0]
    if eng.is_limb(dtype):
        return jnp.zeros((b, 0, 2), jnp.uint32)
    return jnp.zeros((b, 0), eng.jnp_dtype(dtype))


def _zero_blocks(main, dtype):
    b = main.shape[0]
    if eng.is_limb(dtype):
        return jnp.zeros((b, layout.BLOCK, 2), jnp.uint32)
    return jnp.zeros((b, layout.BLOCK), eng.jnp_dtype(dtype))


def warmup(ops=("pack", "unpack"), dtypes=layout.DTYPES, widths=None,
           n_blocks=1024):
    """Compile the ROUTED public entry for each (op, dtype, width) ahead of
    first use — the serving cold-start mitigation (a cold wide-width u64
    Pallas kernel can take ~2 minutes to compile via the remote Mosaic
    toolchain; jit caches are shape-keyed, so pass your production
    n_blocks). Fused ops take zero/dummy parameters. Returns the number of
    entries compiled."""
    import numpy as np

    count = 0
    for dt in dtypes:
        dt = layout.canon_dtype(dt)
        t = layout.bit_width(dt)
        nl = layout.lanes(dt)
        limb = eng.is_limb(dt)
        ws = widths if widths is not None else range(1, t + 1)
        for w in ws:
            layout.check_width(dt, w)
            plen = layout.packed_len(dt, w)
            vshape = (n_blocks, layout.BLOCK, 2) if limb else (n_blocks, layout.BLOCK)
            pshape = (n_blocks, plen, 2) if limb else (n_blocks, plen)
            vals = jnp.zeros(vshape, jnp.uint32 if limb else eng.jnp_dtype(dt))
            pkd = jnp.zeros(pshape, jnp.uint32 if limb else eng.jnp_dtype(dt))
            base = (np.zeros((nl, 2), np.uint32) if limb
                    else np.zeros(nl, layout.np_dtype(dt)))
            for op in ops:
                if op == "pack":
                    jax.block_until_ready(pack(vals, w, dt))
                elif op == "unpack":
                    jax.block_until_ready(unpack(pkd, w, dt))
                elif op == "undelta_pack":
                    jax.block_until_ready(undelta_pack(pkd, base, w, dt))
                elif op == "unzdelta_pack":
                    jax.block_until_ready(unzdelta_pack(pkd, base, w, dt))
                elif op == "for_pack":
                    jax.block_until_ready(for_pack(vals, 0, w, dt))
                elif op == "unfor_pack":
                    jax.block_until_ready(unfor_pack(pkd, 0, w, dt))
                elif op == "unpack_orig":
                    jax.block_until_ready(_first(unpack_orig(pkd, w, dt)))
                elif op == "undelta_pack_orig":
                    jax.block_until_ready(
                        _first(undelta_pack_orig(pkd, base, w, dt)))
                elif op == "unzdelta_pack_orig":
                    jax.block_until_ready(
                        _first(unzdelta_pack_orig(pkd, base, w, dt)))
                elif op == "delta_pack_orig":
                    jax.block_until_ready(delta_pack_orig(vals, w, dt)[0])
                else:
                    raise ValueError(f"unknown op {op!r}")
                count += 1
    return count


def _first(out):
    """Warmup helper: plane tuples (u64 orig decodes) -> one array."""
    return out[0] if isinstance(out, tuple) else out
