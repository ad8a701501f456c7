"""8x8 integer transform / quant kernels in JAX (int32, TPU-friendly).

Bit-exact port of tpuh264.golden.transform8 (whose inverse is validated
against libavcodec's idct8); all intermediates fit int32 for encoder-
produced levels (|W| <= 16320, max MF 20972 -> |W*MF| < 2^29).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..golden.transform8 import (
    INV_ZIGZAG8,
    MF8_TABLE,
    V8_TABLE,
    ZIGZAG8,
)

_MF8 = jnp.asarray(MF8_TABLE)
_V8 = jnp.asarray(V8_TABLE)
_ZZ8 = jnp.asarray(ZIGZAG8)
_IZZ8 = jnp.asarray(INV_ZIGZAG8)


def _fwd_stage(s):
    s07 = s[..., 0] + s[..., 7]
    d07 = s[..., 0] - s[..., 7]
    s16 = s[..., 1] + s[..., 6]
    d16 = s[..., 1] - s[..., 6]
    s25 = s[..., 2] + s[..., 5]
    d25 = s[..., 2] - s[..., 5]
    s34 = s[..., 3] + s[..., 4]
    d34 = s[..., 3] - s[..., 4]
    a0 = s07 + s34
    a1 = s16 + s25
    a2 = s07 - s34
    a3 = s16 - s25
    a4 = d16 + d25 + (d07 + (d07 >> 1))
    a5 = d07 - d34 - (d25 + (d25 >> 1))
    a6 = d07 + d34 - (d16 + (d16 >> 1))
    a7 = d16 - d25 + (d34 + (d34 >> 1))
    return jnp.stack(
        [a0 + a1, a4 + (a7 >> 2), a2 + (a3 >> 1), a5 + (a6 >> 2),
         a0 - a1, a6 - (a5 >> 2), (a2 >> 1) - a3, (a4 >> 2) - a7],
        axis=-1,
    )


def forward8x8(resid: jnp.ndarray) -> jnp.ndarray:
    """[..., 8, 8] int -> coefficients in the normative layout."""
    x = resid.astype(jnp.int32)
    w = _fwd_stage(x)
    w = _fwd_stage(w.swapaxes(-1, -2)).swapaxes(-1, -2)
    return w.swapaxes(-1, -2)


def _inv_stage(s):
    a0 = s[..., 0] + s[..., 4]
    a4 = s[..., 0] - s[..., 4]
    a2 = (s[..., 2] >> 1) - s[..., 6]
    a6 = s[..., 2] + (s[..., 6] >> 1)
    b0 = a0 + a6
    b2 = a4 + a2
    b4 = a4 - a2
    b6 = a0 - a6
    a1 = -s[..., 3] + s[..., 5] - s[..., 7] - (s[..., 7] >> 1)
    a3 = s[..., 1] + s[..., 7] - s[..., 3] - (s[..., 3] >> 1)
    a5 = -s[..., 1] + s[..., 7] + s[..., 5] + (s[..., 5] >> 1)
    a7 = s[..., 3] + s[..., 5] + s[..., 1] + (s[..., 1] >> 1)
    b1 = a1 + (a7 >> 2)
    b7 = a7 - (a1 >> 2)
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    return jnp.stack(
        [b0 + b7, b2 + b5, b4 + b3, b6 + b1,
         b6 - b1, b4 - b3, b2 - b5, b0 - b7],
        axis=-1,
    )


def inverse8x8(d: jnp.ndarray) -> jnp.ndarray:
    x = d.swapaxes(-1, -2).astype(jnp.int32)
    e = _inv_stage(x)
    e = _inv_stage(e.swapaxes(-1, -2)).swapaxes(-1, -2)
    return e


def quant8x8(w: jnp.ndarray, qp, intra: bool = False) -> jnp.ndarray:
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 16 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    mf = _MF8[qp % 6]
    z = (jnp.abs(w) * mf + f) >> qbits
    return jnp.sign(w) * z


def dequant8x8(z: jnp.ndarray, qp) -> jnp.ndarray:
    qp = jnp.asarray(qp, jnp.int32)
    v = _V8[qp % 6]
    shift_up = jnp.maximum(qp // 6 - 2, 0)
    shift_dn = jnp.maximum(2 - qp // 6, 0)
    hi = (z * v) << shift_up
    lo = (z * v + (1 << jnp.maximum(shift_dn - 1, 0))) >> shift_dn
    return jnp.where(qp >= 12, hi, lo)


def idct8_add(pred: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    r = (inverse8x8(d) + 32) >> 6
    return jnp.clip(pred.astype(jnp.int32) + r, 0, 255)


def zigzag8(block: jnp.ndarray) -> jnp.ndarray:
    flat = block.reshape(*block.shape[:-2], 64)
    return flat[..., _ZZ8]


def inverse_zigzag8(coeffs: jnp.ndarray) -> jnp.ndarray:
    out = coeffs[..., _IZZ8]
    return out.reshape(*coeffs.shape[:-1], 8, 8)
