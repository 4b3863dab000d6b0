"""Device-side FFM weight initialization.

The reference initializes FFM weights with ``merand48`` (a 48-bit LCG,
reference: src/block_ffm.rs:793-829). For 2^29-weight tables, generating on
the host and shipping ~2 GB through the host↔device link dominated startup
(~2 minutes measured); this module evaluates the identical LCG on device
with 32-bit arithmetic (JAX's default x64-disabled mode has no uint64):

    state  = A·x + C  (mod 2^64),  A = 0xEECE66D5DEECE66D, C = 2^31 − 1
    value  = bitcast(((state >> 25) & 0x7FFFFF) | 127<<23) − 1.0  ∈ [0, 1)

Verified element-wise against the NumPy implementation in hashing.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_A_HI = 0xEECE66D5
_A_LO = 0xDEECE66D
_C = 2147483647


def _mulhi32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 32 bits of a u32×u32 product via 16-bit limbs."""
    a_lo = a & jnp.uint32(0xFFFF)
    a_hi = jax.lax.shift_right_logical(a, jnp.uint32(16))
    b_lo = b & jnp.uint32(0xFFFF)
    b_hi = jax.lax.shift_right_logical(b, jnp.uint32(16))
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = jax.lax.shift_right_logical(ll, jnp.uint32(16)) + (lh & jnp.uint32(0xFFFF)) + (
        hl & jnp.uint32(0xFFFF)
    )
    return hh + jax.lax.shift_right_logical(lh, jnp.uint32(16)) + \
        jax.lax.shift_right_logical(hl, jnp.uint32(16)) + \
        jax.lax.shift_right_logical(mid, jnp.uint32(16))


def merand48(x: jnp.ndarray) -> jnp.ndarray:
    """merand48 of u32 indices → f32 in [0, 1) (device-friendly)."""
    x = x.astype(jnp.uint32)
    lo = jnp.uint32(_A_LO) * x  # low 32 bits, wrapping
    carry = _mulhi32(jnp.uint32(_A_LO), x)
    hi = jnp.uint32(_A_HI) * x + carry
    lo_c = lo + jnp.uint32(_C)
    hi = hi + (lo_c < lo).astype(jnp.uint32)  # carry from + C
    # bits 25..47 of the 64-bit state
    bits = (jax.lax.shift_right_logical(lo_c, jnp.uint32(25)) |
            jax.lax.shift_left(hi, jnp.uint32(7))) & jnp.uint32(0x7FFFFF)
    bits = bits | jnp.uint32(127 << 23)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - jnp.float32(1.0)


@functools.partial(jax.jit, static_argnames=("size", "offset", "scale"))
def _ffm_default_block(start: jnp.ndarray, size: int, offset: int, scale: float):
    idx = start + jnp.arange(size, dtype=jnp.uint32) + jnp.uint32(offset)
    return (merand48(idx) - jnp.float32(0.5)) * jnp.float32(scale)


def ffm_init_default(n: int, k: int, padded: int) -> jnp.ndarray:
    """Default FFM init on device: (merand48(n + i) − 0.5)/√k/50 for i < n,
    zero padding to ``padded`` (reference: src/block_ffm.rs:796-806)."""
    import numpy as np

    scale = float(1.0 / np.sqrt(k) / 50.0)
    w = _ffm_default_block(jnp.uint32(0), padded, n, scale)
    if padded > n:
        mask = jnp.arange(padded, dtype=jnp.uint32) < jnp.uint32(n)
        w = jnp.where(mask, w, 0.0)
    return w


@functools.partial(jax.jit, static_argnames=("size", "band_width", "zero_half_band", "center"))
def _ffm_band_block(size: int, band_width: float, zero_half_band: float,
                    center: float):
    idx = jnp.arange(size, dtype=jnp.uint32)
    w = merand48(idx) * jnp.float32(band_width) - jnp.float32(band_width) * jnp.float32(0.5)
    w = jnp.where(w > 0.0, w + jnp.float32(zero_half_band), w - jnp.float32(zero_half_band))
    return w + jnp.float32(center)


def ffm_init_band(n: int, padded: int, init_width: float, init_zero_band: float,
                  init_center: float) -> jnp.ndarray:
    """center/width/zero-band init scheme (reference: src/block_ffm.rs:807-822)."""
    zero_half_band = float(init_width * init_zero_band * 0.5)
    band_width = float(init_width * (1.0 - init_zero_band))
    w = _ffm_band_block(padded, band_width, zero_half_band, init_center)
    if padded > n:
        mask = jnp.arange(padded, dtype=jnp.uint32) < jnp.uint32(n)
        w = jnp.where(mask, w, 0.0)
    return w
