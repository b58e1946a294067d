"""Device bitplane encoder/decoder with error collection.

TPU-native re-design of the reference BPEncoderRegisterBlock
(reference: include/mgard-x/MDR-X/BitplaneEncoder/BPEncoderRegisterBlock.hpp:15-470
— per-thread register bit-transpose of 32-element batches) and the
Max/Squared error collectors (reference: MDR-X/ErrorCollector/).

Here the bit transpose is a whole-array vectorized op: coefficients are
scaled to fixed point against the level exponent, and each of the B
magnitude bitplanes (MSB first) plus the sign plane is packed 32 symbols per
uint32 word via a shift/mask/weighted-sum — the same plane machinery as the
BlockDelta backend. Reconstruction at b planes uses midpoint correction
(+half step on truncated nonzero magnitudes), and the collected per-plane
error tables use the identical rule, so the error estimates are exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 32


def _pack_bits(bits2d):
    """(m, LANES) 0/1 uint32 -> (m,) uint32 words (bit t = lane t)."""
    pow2 = (jnp.uint32(1) << jnp.arange(LANES, dtype=jnp.uint32))[None, :]
    return jnp.sum(bits2d * pow2, axis=1, dtype=jnp.uint32)


@partial(jax.jit, static_argnums=(1,))
def encode_kernel(coeff, B: int):
    """Encode one level's flat coefficients into sign+magnitude bitplanes.

    coeff: (n,) float (n multiple of 32; pad with zeros).
    Returns (planes (B+1, n//32) uint32 [row 0 = signs, rows 1.. = MSB..LSB],
             exp int32 scalar,
             err_max (B+1,), err_sq (B+1,) float64: reconstruction errors
             when using b = 0..B magnitude planes).
    """
    n = coeff.shape[0]
    v = coeff.astype(jnp.float64)
    amax = jnp.max(jnp.abs(v))
    # level exponent: 2^exp >= amax (reference uses frexp-style exponents)
    exp = jnp.where(amax > 0, jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))), 0.0)
    exp = exp.astype(jnp.int32)
    scale = jnp.exp2((B - 1) - exp.astype(jnp.float64))
    fixed = jnp.minimum(
        jnp.round(jnp.abs(v) * scale), jnp.float64(2 ** (B - 1) - 1)
    ).astype(jnp.uint32)
    sign = (v < 0).astype(jnp.uint32)

    m = n // LANES
    fx = fixed.reshape(m, LANES)
    sg = sign.reshape(m, LANES)
    rows = [_pack_bits(sg)]
    for j in range(B - 1, -1, -1):  # MSB first
        rows.append(_pack_bits((fx >> jnp.uint32(j)) & jnp.uint32(1)))
    planes = jnp.stack(rows, axis=0)  # (B+1, m)

    # error tables with the decoder's midpoint rule
    inv_scale = 1.0 / scale
    signf = jnp.where(sign == 1, -1.0, 1.0)
    err_max = []
    err_sq = []
    for b in range(B + 1):
        if b == 0:
            rec = jnp.zeros_like(v)
        else:
            keep = jnp.uint32(0xFFFFFFFF) << jnp.uint32(B - b)
            mag = fixed & keep
            half = jnp.where(
                (b < B) & (mag > 0), jnp.uint32(1) << jnp.uint32(max(B - b - 1, 0)), 0
            ).astype(jnp.float64)
            rec = signf * (mag.astype(jnp.float64) + half) * inv_scale
        diff = v - rec
        err_max.append(jnp.max(jnp.abs(diff)))
        err_sq.append(jnp.sum(diff * diff))
    return planes, exp, jnp.stack(err_max), jnp.stack(err_sq)


@partial(jax.jit, static_argnums=(2, 3))
def decode_kernel(planes, exp, B: int, b: int):
    """Reconstruct coefficients from the sign plane + the b leading
    magnitude planes. planes: (1+b, m) uint32. Returns (m*32,) float64."""
    m = planes.shape[1]
    lanes = jnp.arange(LANES, dtype=jnp.uint32)[None, :]
    sign_bits = (planes[0][:, None] >> lanes) & jnp.uint32(1)
    mag = jnp.zeros((m, LANES), jnp.uint32)
    for i in range(b):
        bit = (planes[1 + i][:, None] >> lanes) & jnp.uint32(1)
        mag = mag | (bit << jnp.uint32(B - 1 - i))
    half = jnp.where(
        (mag > 0) & (b < B), jnp.uint32(1) << jnp.uint32(max(B - b - 1, 0)), 0
    )
    signf = jnp.where(sign_bits == 1, -1.0, 1.0)
    inv_scale = jnp.exp2(exp.astype(jnp.float64) - (B - 1))
    vals = signf * (mag + half).astype(jnp.float64) * inv_scale
    return vals.reshape(m * LANES)


# ----------------------------------------------------------------------
# NegaBinary encoding (reference: NegaBinaryBPEncoder, MDR/BitplaneEncoder/
# and the EncodeNegaBinary path of BPEncoderRegisterBlock.hpp:183): signed
# fixed-point values are mapped to base(-2) digits, removing the separate
# sign plane; truncating trailing planes still yields a signed value.
# ----------------------------------------------------------------------
def _nb_mask(B: int) -> int:
    """0b1010...10 over B bits (weights of the odd, negative, positions)."""
    m = 0
    for j in range(1, B, 2):
        m |= 1 << j
    return m


@partial(jax.jit, static_argnums=(1,))
def encode_kernel_negabinary(coeff, B: int):
    """NegaBinary variant of encode_kernel.

    Returns (planes (B, n//32) uint32 [rows = MSB..LSB, no sign plane],
    exp, err_max (B+1,), err_sq (B+1,)). The fixed-point scale uses B-2
    fraction bits so both signs fit the B-bit negabinary range
    [-(2/3)2^B, (1/3)2^B)."""
    n = coeff.shape[0]
    v = coeff.astype(jnp.float64)
    amax = jnp.max(jnp.abs(v))
    exp = jnp.where(amax > 0, jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))), 0.0)
    exp = exp.astype(jnp.int32)
    scale = jnp.exp2((B - 2) - exp.astype(jnp.float64))
    lim = float(2 ** (B - 2) - 1)
    fixed = jnp.clip(jnp.round(v * scale), -lim, lim).astype(jnp.int64)
    M = _nb_mask(B)
    u = ((fixed + M) ^ M).astype(jnp.uint32)  # B-bit negabinary digits

    m = n // LANES
    ub = u.reshape(m, LANES)
    rows = []
    for j in range(B - 1, -1, -1):  # MSB first
        rows.append(_pack_bits((ub >> jnp.uint32(j)) & jnp.uint32(1)))
    planes = jnp.stack(rows, axis=0)  # (B, m)

    inv_scale = 1.0 / scale
    err_max = []
    err_sq = []
    for b in range(B + 1):
        if b == 0:
            rec = jnp.zeros_like(v)
        else:
            keep = jnp.uint32(((1 << B) - 1) & ~((1 << (B - b)) - 1))
            ut = u & keep
            xt = (ut.astype(jnp.int64) ^ M) - M
            rec = xt.astype(jnp.float64) * inv_scale
        diff = v - rec
        err_max.append(jnp.max(jnp.abs(diff)))
        err_sq.append(jnp.sum(diff * diff))
    return planes, exp, jnp.stack(err_max), jnp.stack(err_sq)


@partial(jax.jit, static_argnums=(2, 3))
def decode_kernel_negabinary(planes, exp, B: int, b: int):
    """Reconstruct from the b leading negabinary planes.
    planes: (b, m) uint32. Returns (m*32,) float64."""
    m = planes.shape[1]
    lanes = jnp.arange(LANES, dtype=jnp.uint32)[None, :]
    u = jnp.zeros((m, LANES), jnp.uint32)
    for i in range(b):
        bit = (planes[i][:, None] >> lanes) & jnp.uint32(1)
        u = u | (bit << jnp.uint32(B - 1 - i))
    M = _nb_mask(B)
    x = (u.astype(jnp.int64) ^ M) - M
    inv_scale = jnp.exp2(exp.astype(jnp.float64) - (B - 2))
    return (x.astype(jnp.float64) * inv_scale).reshape(m * LANES)


def encode_level(coeff_flat, B: int):
    """Host wrapper: pad to a multiple of 32 and encode."""
    n = int(coeff_flat.shape[0])
    pad = (-n) % LANES
    if pad:
        coeff_flat = jnp.concatenate(
            [coeff_flat, jnp.zeros((pad,), coeff_flat.dtype)]
        )
    planes, exp, err_max, err_sq = encode_kernel(coeff_flat, B)
    return planes, int(exp), np.asarray(err_max), np.asarray(err_sq), n


def decode_level(planes, exp: int, B: int, b: int, n: int):
    """Host wrapper: decode with b magnitude planes, trim padding."""
    vals = decode_kernel(jnp.asarray(planes), jnp.asarray(exp, jnp.int32), B, b)
    return vals[:n]
