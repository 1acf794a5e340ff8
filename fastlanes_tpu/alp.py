"""ALP: Adaptive Lossless floating-Point compression on the FastLanes
machinery (Afroozeh, Kuffo & Boncz, "ALP: Adaptive Lossless floating-Point
Compression", SIGMOD 2023 — the codec family the FastLanes VLDB'23 paper
builds toward; NOT part of the Rust reference crate, which is integer-only:
reference src/ has no float code. This is beyond-parity surface).

Scheme (self-consistent spec, chosen for device reproducibility):

  encode:  ints = round(v * 10^e * 10^-f)            (host, float64 math)
  decode:  v'   = (float(ints) * 10^f) / 10^e        (value dtype)
  exceptions: every position where decode(encode(v)) != v bitwise (NaN,
  inf, overflow, precision loss) stores the original value verbatim and is
  patched after decode; its slot in the int stream holds a filler so it
  never widens the packed width.

Why multiply-then-DIVIDE instead of one multiply by 10^(f-e): 10^e and 10^f
are exactly representable in the value dtype over the whole search range
(10^e = 2^e * 5^e and 5^10 < 2^24 for f32, 5^18 < 2^53 for f64), so with
f = 0 and |ints| inside the exact-conversion range, IEEE division yields
the correctly rounded quotient — identical to how the original decimal
value rounded into the dtype. A single multiply by the INEXACT factor
10^(f-e) loses that (measured ~27% exceptions on 2-decimal f32 data vs ~0
with the division form).

The integer stream is FFoR'd (shifted by its min) and bit-packed with the
existing integer codecs, so ALP decode on device = unfor-style unshift ->
convert -> one multiply -> exception scatter. IEEE-754 multiply and
int->float conversion round identically on numpy and XLA, so the decode
spec is bit-exact across hosts and chips — and the encoder's roundtrip
check makes correctness independent of that anyway: any value the spec
cannot reproduce is an exception by construction.

float32 columns: |i * 10^f| bounded below 2^24 (exact in int32 AND f32),
payload u32. On TPU the hardware f32 divide is NOT correctly rounded
(measured 1-ulp-off on ~20% of decimal quotients), so the device decode
computes the IEEE quotient in the INTEGER domain — see
_div_pow10_f32_device — bit-exact with the host spec (validated on the
real chip over millions of values, every d in 0..10).
float64 columns: ints bounded to +-2^52, payload u64 (limb pairs); the
decode needs f64 — native on CPU jax (x64), host codec path on TPU.
"""

from __future__ import annotations

import numpy as np

# exponent search space (the ALP paper's ranges): 10^e exactly representable
# in the float64 encode domain
_MAX_E = {4: 10, 8: 18}
# f64 |ints| bound: exact int64->f64 conversion domain (f32 uses the
# tighter |i * 10^f| < 2^24 bound computed in _ok_mask)
_INT_BOUND = {8: 2 ** 52}


def _pow10(k: int, np_float) -> np.floating:
    """10^k in the value dtype — exact over the search range (see module
    docstring)."""
    return np_float(np.float64(10.0) ** k)


def _encode_ints(values64: np.ndarray, e: int, f: int) -> np.ndarray:
    """round(v * 10^e / 10^f) in float64, as int64 (non-finite/overflow
    positions produce garbage here and are filtered by _ok_mask)."""
    scaled = values64 * (np.float64(10.0) ** e) * (np.float64(10.0) ** -f)
    scaled = np.where(np.isfinite(scaled), scaled, 0.0)
    scaled = np.clip(scaled, -(2.0 ** 62), 2.0 ** 62)
    return np.round(scaled).astype(np.int64)


def _decode_np(ints: np.ndarray, e: int, f: int, np_float) -> np.ndarray:
    scaled = ints.astype(np_float) * _pow10(f, np_float)
    return (scaled / _pow10(e, np_float)).astype(np_float)


def _ok_mask(values: np.ndarray, ints: np.ndarray, e: int, f: int) -> np.ndarray:
    """Positions the spec reproduces exactly AND whose int fits the device
    domain. NaN/inf fail the equality (NaN != NaN) and become exceptions.

    f32 in-range bound: |i * 10^f| < 2^24, so the scaled int is exact in
    both int32 and f32 and the device's integer-domain division
    (_div_pow10_f32_device) is bit-identical to the host's IEEE f32 divide.
    f64 bound: |i| <= 2^52 (exact int64->f64 conversion; host and device
    then run the identical f64 op sequence)."""
    np_float = values.dtype.type
    if values.dtype.itemsize == 4:
        bound = ((1 << 24) - 1) // (10 ** f)
    else:
        bound = _INT_BOUND[8]
    dec = _decode_np(ints, e, f, np_float)
    # bitwise equality: value equality AND matching sign bit (-0.0 == +0.0
    # numerically but must round-trip its sign)
    ok = (dec == values) & (np.signbit(dec) == np.signbit(values))
    return ok & (ints >= -bound) & (ints <= bound)


def choose_ef(sample: np.ndarray) -> tuple[int, int]:
    """Pick (e, f) minimizing estimated bits/value on a sample: packed width
    of the FFoR'd ints plus the exception overhead (position + raw value).
    Deterministic: ties break toward smaller e, then smaller f."""
    itemsize = sample.dtype.itemsize
    vals64 = sample.astype(np.float64)
    best = (float("inf"), 0, 0)
    for e in range(_MAX_E[itemsize] + 1):
        for f in range(e + 1):
            ints = _encode_ints(vals64, e, f)
            ok = _ok_mask(sample, ints, e, f)
            n_exc = int(sample.size - np.count_nonzero(ok))
            if n_exc == sample.size:
                continue
            good = ints[ok]
            spread = int(good.max() - good.min()) if good.size else 0
            width = spread.bit_length()
            bits = width + n_exc / sample.size * (itemsize * 8 + 32)
            if bits < best[0] - 1e-9:
                best = (bits, e, f)
    return best[1], best[2]


def encode_np(values: np.ndarray, e=None, f=None) -> dict:
    """Encode a float32/float64 array. Returns
    {e, f, reference, width, ints, exc_pos, exc_val}: `ints` is the FFoR'd
    (min-shifted) non-negative unsigned stream ready for bit-packing
    (uint32 for f32, uint64 for f64); exceptions carry original values."""
    if values.dtype not in (np.float32, np.float64):
        raise ValueError(f"ALP encodes float32/float64, got {values.dtype}")
    if e is None or f is None:
        flat = values.reshape(-1)
        sample = np.ascontiguousarray(flat[:: max(1, flat.size // 2048)][:2048])
        e, f = choose_ef(sample)
    ints = _encode_ints(values.astype(np.float64), e, f)
    ok = _ok_mask(values, ints, e, f)
    exc_pos = np.flatnonzero(~ok).astype(np.uint32)
    exc_val = values.reshape(-1)[exc_pos]
    good = ints.reshape(-1)[ok.reshape(-1)]
    fill = np.int64(good[0]) if good.size else np.int64(0)
    ints = ints.reshape(-1).copy()
    ints[exc_pos] = fill
    ints = ints.reshape(values.shape)
    ref = int(ints.min()) if ints.size else 0
    shifted = ints - np.int64(ref)
    width = int(shifted.max()).bit_length() if shifted.size else 0
    u_dt = np.uint32 if values.dtype == np.float32 else np.uint64
    return {
        "e": int(e), "f": int(f), "reference": ref, "width": width,
        "ints": shifted.astype(u_dt), "exc_pos": exc_pos, "exc_val": exc_val,
    }


def decode_np(shifted: np.ndarray, e: int, f: int, reference: int,
              np_float, exc_pos=None, exc_val=None) -> np.ndarray:
    """Inverse of encode_np: unshift, multiply by FACTOR in the value dtype,
    patch exceptions."""
    ints = shifted.astype(np.int64) + np.int64(reference)
    out = np.ascontiguousarray(_decode_np(ints, e, f, np_float))
    if exc_pos is not None and len(exc_pos):
        flat = out.reshape(-1)
        flat[np.asarray(exc_pos, np.int64)] = exc_val
        out = flat.reshape(out.shape)
    return out


def _div_pow10_f32_device(x_int, d: int):
    """Correctly-rounded f32 quotient x / 10^d for exact int32 x
    (|x| < 2^24), WITHOUT floating-point division — TPU's f32 divide is
    not correctly rounded (measured 1-ulp-off on ~20% of decimal values),
    so the IEEE division the wire spec demands is computed exactly in the
    integer domain:

      x/10^d = (x/5^d) * 2^-d   (power-of-2 scaling commutes with RN)

    then floor(a<<k / 5^d) by chunked long division (7-bit steps keep every
    intermediate inside int32), producing a 25-bit quotient = 24-bit
    mantissa + round bit, remainder = sticky, round-to-nearest-even, and an
    exact jnp.ldexp scale. ~30 int32 vector ops/element — still
    HBM-bound at decode batch sizes."""
    import jax
    import jax.numpy as jnp

    if d == 0:
        return x_int.astype(jnp.float32)
    F = 5 ** d
    K = F.bit_length()  # 2^K/F in (1, 2]; quotient lands in [2^23, 2^25)

    x_int = x_int.astype(jnp.int32)
    neg = x_int < 0
    a = jnp.where(neg, -x_int, x_int)
    zero = a == 0
    a_safe = jnp.where(zero, jnp.int32(1), a)
    # normalize |x| to [2^23, 2^24): za in [0, 23]
    nbits = jnp.int32(32) - jax.lax.clz(a_safe)
    za = jnp.int32(24) - nbits
    an = a_safe << za
    # long division: q = floor(an * 2^K / F), r = remainder — K extra bits
    # fed in chunks of <= 7 so r << s stays < F * 2^7 <= 2^31
    q = an // jnp.int32(F)
    r = an - q * jnp.int32(F)
    rem_bits = K
    while rem_bits > 0:
        s = min(7, rem_bits)
        r = r << s
        step = r // jnp.int32(F)
        q = (q << s) + step
        r = r - step * jnp.int32(F)
        rem_bits -= s
    # q in [2^23 * 2^K/F, 2^24 * 2^K/F) subset [2^23, 2^25): widen 24-bit
    # cases by one more quotient bit so q uniformly holds 25 bits
    need = q < jnp.int32(1 << 24)
    r2 = r << 1
    bit = (r2 >= jnp.int32(F)).astype(jnp.int32)
    q = jnp.where(need, (q << 1) + bit, q)
    r = jnp.where(need, r2 - bit * jnp.int32(F), r)
    kadj = need.astype(jnp.int32)
    # round to nearest, ties to even
    round_bit = q & 1
    q_hi = q >> 1  # 24-bit mantissa in [2^23, 2^24)
    sticky = (r != 0).astype(jnp.int32)
    q_hi = q_hi + (round_bit & (sticky | (q_hi & 1)))
    # value = q * 2^-(za + K + kadj) * 2^-d, q = 2*q_hi (pre-round)
    exp = -(za + jnp.int32(K) + kadj) + jnp.int32(1 - d)
    out = jnp.ldexp(q_hi.astype(jnp.float32), exp)
    out = jnp.where(zero, jnp.float32(0.0), out)
    return jnp.where(neg, -out, out).astype(jnp.float32)


def decode_device(shifted, e: int, f: int, reference: int, np_float,
                  exc_pos=None, exc_val=None):
    """Device twin of decode_np (jnp): unshift -> convert -> scale ->
    scatter-patch, bit-exact with the host spec.

    f32 payloads: the multiply by 10^f stays in the exact-int domain and
    the divide by 10^e runs through _div_pow10_f32_device (TPU's hardware
    divide is not IEEE-correctly-rounded; the encoder's in-range bound
    keeps |i * 10^f| < 2^24 so both steps are exact/NR-exact).
    f64 payloads need x64 jax (CPU IEEE divide) — TPU has no f64 vectors."""
    import jax.numpy as jnp

    if np_float == np.float64:
        ints = shifted.astype(jnp.int64) + jnp.int64(reference)
        scaled = ints.astype(jnp.float64) * jnp.float64(_pow10(f, np_float))
        out = scaled / jnp.float64(_pow10(e, np_float))
    else:
        ints = shifted.astype(jnp.int32) + jnp.int32(reference)
        x = ints * jnp.int32(10 ** f)  # exact: in-range values are < 2^24
        out = _div_pow10_f32_device(x, e)
    if exc_pos is not None and len(exc_pos):
        flat = out.reshape(-1)
        flat = flat.at[jnp.asarray(np.asarray(exc_pos, np.int64))].set(
            jnp.asarray(exc_val))
        out = flat.reshape(out.shape)
    return out


# ---------------------------------------------------------------------------
# ALP_RD: the "real doubles" fallback (ALP paper §4.3) for floats that are
# NOT decimal-like (the plain ALP scheme would emit ~100% exceptions).
# Each value's bit pattern splits at a cut point into a LEFT part (sign +
# exponent + top mantissa bits — few distinct values on real data, so
# dictionary-coded at ceil(log2(dict)) bits) and a RIGHT part (low mantissa
# bits, near-entropy, stored bit-packed verbatim). Decode is pure integer
# ops: value_bits = (dict[left_idx] << right_bits) | right. Always
# lossless; compression comes from the left dictionary.

_RD_MAX_DICT = 8  # left dictionary entries (3-bit indices, per the paper)


def rd_choose_cut(bits: np.ndarray, total_bits: int) -> int:
    """Pick right-part width minimizing estimated bits/value: right_bits +
    index bits + exception overhead. Candidate cuts keep the left part
    <= 16 bits (dictionary domain)."""
    flat = bits.reshape(-1)
    sample = flat[:: max(1, flat.size // 2048)][:2048]
    best = (float("inf"), total_bits - 1)
    for right_bits in range(max(total_bits - 16, 1), total_bits):
        lefts, counts = np.unique(sample >> right_bits, return_counts=True)
        order = np.argsort(counts)[::-1]
        in_dict = counts[order[:_RD_MAX_DICT]].sum()
        exc_rate = 1.0 - in_dict / sample.size
        idx_bits = max(1, int(np.ceil(np.log2(min(len(lefts), _RD_MAX_DICT) + 1e-9)))
                       ) if len(lefts) > 1 else 1
        cost = right_bits + idx_bits + exc_rate * (16 + 32)
        if cost < best[0] - 1e-9:
            best = (cost, right_bits)
    return best[1]


def rd_encode_np(values: np.ndarray) -> dict:
    """Encode float32/float64 via the left/right split. Returns
    {right_bits, dict (uint16/uint32 lefts), left_idx (uint16), rights
    (uint of value size), exc_pos (uint32), exc_left (uint32)} — exceptions
    are positions whose LEFT part is outside the dictionary; their left
    value is stored verbatim and their left_idx slot is 0."""
    if values.dtype not in (np.float32, np.float64):
        raise ValueError(f"ALP_RD encodes float32/float64, got {values.dtype}")
    t = values.dtype.itemsize * 8
    u_dt = np.uint32 if t == 32 else np.uint64
    bits = values.view(u_dt)
    right_bits = rd_choose_cut(bits, t)
    lefts = (bits >> u_dt(right_bits)).reshape(-1)
    rights = bits & u_dt((1 << right_bits) - 1)
    uniq, counts = np.unique(lefts, return_counts=True)
    order = np.argsort(counts)[::-1][:_RD_MAX_DICT]
    dictionary = np.sort(uniq[order])  # deterministic wire order
    pos = np.searchsorted(dictionary, lefts)
    pos = np.clip(pos, 0, len(dictionary) - 1)
    hit = dictionary[pos] == lefts
    exc_pos = np.flatnonzero(~hit).astype(np.uint32)
    exc_left = lefts[~hit].astype(np.uint32)  # left <= 16 bits
    left_idx = np.where(hit, pos, 0).astype(np.uint16)
    return {
        "right_bits": int(right_bits),
        "dict": dictionary.astype(np.uint32),
        "left_idx": left_idx.reshape(values.shape),
        "rights": rights,
        "exc_pos": exc_pos,
        "exc_left": exc_left,
    }


def rd_decode_np(left_idx, rights, dictionary, right_bits: int, np_float,
                 exc_pos=None, exc_left=None) -> np.ndarray:
    t = np.dtype(np_float).itemsize * 8
    u_dt = np.uint32 if t == 32 else np.uint64
    lefts = dictionary.astype(u_dt)[left_idx.astype(np.int64)]
    if exc_pos is not None and len(exc_pos):
        flat = lefts.reshape(-1)
        flat[np.asarray(exc_pos, np.int64)] = exc_left.astype(u_dt)
        lefts = flat.reshape(left_idx.shape)
    bits = (lefts << u_dt(right_bits)) | rights.astype(u_dt)
    return bits.view(np_float)


def rd_decode_device(left_idx, rights, dictionary, right_bits: int, np_float,
                     exc_pos=None, exc_val=None):
    """Device twin: dict gather + shift/or + bitcast. f32 native; f64
    assembled in the (lo, hi) limb domain and returned as the (..., 2)
    uint32 limb image of the float64 bits (x64-free)."""
    import jax
    import jax.numpy as jnp

    dict_dev = jnp.asarray(np.asarray(dictionary, np.uint32))
    lefts = jnp.take(dict_dev, left_idx.astype(jnp.int32))
    if exc_pos is not None and len(exc_pos):
        flat = lefts.reshape(-1)
        flat = flat.at[jnp.asarray(np.asarray(exc_pos, np.int64))].set(
            jnp.asarray(np.asarray(exc_val, np.uint32)))
        lefts = flat.reshape(left_idx.shape)
    if np_float == np.float32:
        bits = (lefts << jnp.uint32(right_bits)) | rights.astype(jnp.uint32)
        return jax.lax.bitcast_convert_type(bits, jnp.float32)
    # f64: rights arrive as a (..., 2) uint32 limb image; place the left
    # part into the high bits across the limb boundary (right_bits >= 32
    # always holds for the f64 cut range 48..63)
    if right_bits < 32:
        raise ValueError("f64 ALP_RD cut keeps right_bits >= 32")
    lo = rights[..., 0]
    hi = rights[..., 1] | (lefts << jnp.uint32(right_bits - 32))
    return jnp.stack([lo, hi], axis=-1)
