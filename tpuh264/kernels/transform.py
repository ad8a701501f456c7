"""H.264 4x4 integer transform / quant kernels in JAX (int32, TPU-friendly).

Bit-exact port of tpuh264.golden.transform (the numpy oracle); every value
fits int32 (worst case |W|*MF ~ 2.1e8 < 2^31), so no 64-bit math is needed
on TPU.  Batched over arbitrary leading axes; the batch is the vector axis
the VPU parallelizes over, and the butterflies are adds/shifts.

`qp` is a *traced* int32 scalar everywhere: rate control changes QP per
frame, and a static QP would force an XLA recompile each time
(table rows become dynamic gathers; shift amounts are clamped dynamic
shifts, since a negative shift count is undefined).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..golden.transform import MF_TABLE, V_TABLE, ZIGZAG4, CHROMA_QP_TABLE

_MF = jnp.asarray(MF_TABLE)  # (6,4,4)
_V = jnp.asarray(V_TABLE)
_ZZ = jnp.asarray(ZIGZAG4)
_INV_ZZ = jnp.asarray(np.argsort(ZIGZAG4))  # gather indices for inverse scan
_CHROMA_QP = jnp.asarray(CHROMA_QP_TABLE)
_V_FLAT = jnp.asarray(V_TABLE.reshape(6, 16))  # raster-flat dequant scale


def forward4x4(x: jnp.ndarray) -> jnp.ndarray:
    """Forward core transform over [..., 4, 4] via butterflies (exact)."""
    x = x.astype(jnp.int32)
    # columns: s = C @ x  (C rows: [1,1,1,1],[2,1,-1,-2],[1,-1,-1,1],[1,-2,2,-1])
    a0 = x[..., 0, :] + x[..., 3, :]
    a1 = x[..., 1, :] + x[..., 2, :]
    a2 = x[..., 1, :] - x[..., 2, :]
    a3 = x[..., 0, :] - x[..., 3, :]
    s0 = a0 + a1
    s1 = 2 * a3 + a2
    s2 = a0 - a1
    s3 = a3 - 2 * a2
    s = jnp.stack([s0, s1, s2, s3], axis=-2)
    # rows: W = s @ C^T
    b0 = s[..., :, 0] + s[..., :, 3]
    b1 = s[..., :, 1] + s[..., :, 2]
    b2 = s[..., :, 1] - s[..., :, 2]
    b3 = s[..., :, 0] - s[..., :, 3]
    w0 = b0 + b1
    w1 = 2 * b3 + b2
    w2 = b0 - b1
    w3 = b3 - 2 * b2
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def hadamard4x4(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.int32)
    a0 = x[..., 0, :] + x[..., 3, :]
    a1 = x[..., 1, :] + x[..., 2, :]
    a2 = x[..., 1, :] - x[..., 2, :]
    a3 = x[..., 0, :] - x[..., 3, :]
    s = jnp.stack([a0 + a1, a3 + a2, a0 - a1, a3 - a2], axis=-2)
    b0 = s[..., :, 0] + s[..., :, 3]
    b1 = s[..., :, 1] + s[..., :, 2]
    b2 = s[..., :, 1] - s[..., :, 2]
    b3 = s[..., :, 0] - s[..., :, 3]
    return jnp.stack([b0 + b1, b3 + b2, b0 - b1, b3 - b2], axis=-1)


def hadamard2x2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.int32)
    a = x[..., 0, :] + x[..., 1, :]
    b = x[..., 0, :] - x[..., 1, :]
    s = jnp.stack([a, b], axis=-2)
    c = s[..., :, 0] + s[..., :, 1]
    d = s[..., :, 0] - s[..., :, 1]
    return jnp.stack([c, d], axis=-1)


def _qp_consts(qp):
    """(qbits, f_intra) as traced int32 scalars."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    return qp, qbits


def quant4x4(w: jnp.ndarray, qp, intra: bool = True) -> jnp.ndarray:
    qp, qbits = _qp_consts(qp)
    f = (1 << qbits) // (3 if intra else 6)
    mf = _MF[qp % 6]
    z = (jnp.abs(w) * mf + f) >> qbits
    return jnp.sign(w) * z


def quant_luma_dc(wdc_hadamard: jnp.ndarray, qp) -> jnp.ndarray:
    qp, qbits = _qp_consts(qp)
    f = (1 << qbits) // 3
    mf0 = _MF[qp % 6, 0, 0]
    z = (jnp.abs(wdc_hadamard) * mf0 + (f << 2)) >> (qbits + 2)
    return jnp.sign(wdc_hadamard) * z


def quant_chroma_dc(wdc_hadamard: jnp.ndarray, qp, intra: bool = True) -> jnp.ndarray:
    qp, qbits = _qp_consts(qp)
    f = (1 << qbits) // (3 if intra else 6)
    mf0 = _MF[qp % 6, 0, 0]
    z = (jnp.abs(wdc_hadamard) * mf0 + (f << 1)) >> (qbits + 1)
    return jnp.sign(wdc_hadamard) * z


def dequant4x4(z: jnp.ndarray, qp) -> jnp.ndarray:
    qp = jnp.asarray(qp, jnp.int32)
    return (z * _V[qp % 6]) << (qp // 6)


def dequant_luma_dc(z: jnp.ndarray, qp) -> jnp.ndarray:
    qp = jnp.asarray(qp, jnp.int32)
    f = hadamard4x4(z)
    v0 = _V[qp % 6, 0, 0]
    shift_up = jnp.maximum(qp // 6 - 2, 0)
    shift_dn = jnp.maximum(2 - qp // 6, 0)
    hi = (f * v0) << shift_up
    lo = (f * v0 + (1 << jnp.maximum(shift_dn - 1, 0))) >> shift_dn
    return jnp.where(qp >= 12, hi, lo)


def dequant_chroma_dc(z: jnp.ndarray, qp) -> jnp.ndarray:
    qp = jnp.asarray(qp, jnp.int32)
    f = hadamard2x2(z)
    v0 = _V[qp % 6, 0, 0]
    return ((f * v0) << (qp // 6)) >> 1


def inverse4x4(d: jnp.ndarray) -> jnp.ndarray:
    """Normative inverse transform (8.5.12.2): rows first, then columns."""
    d = d.astype(jnp.int32)
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    return jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)


def idct_add(pred: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    r = (inverse4x4(d) + 32) >> 6
    return jnp.clip(pred.astype(jnp.int32) + r, 0, 255)


def zigzag(block: jnp.ndarray) -> jnp.ndarray:
    flat = block.reshape(*block.shape[:-2], 16)
    return flat[..., _ZZ]


def inverse_zigzag(coeffs: jnp.ndarray) -> jnp.ndarray:
    """[..., 16] zigzag order -> [..., 4, 4] via gather (no scatter ops --
    scatters are the expensive path on TPU and in XLA compile time)."""
    out = coeffs[..., _INV_ZZ]
    return out.reshape(*coeffs.shape[:-1], 4, 4)


def dequant_flat(z_flat: jnp.ndarray, qp) -> jnp.ndarray:
    """Dequant on raster-flat [..., 16] coefficient vectors."""
    qp = jnp.asarray(qp, jnp.int32)
    return (z_flat * _V_FLAT[qp % 6]) << (qp // 6)


def chroma_qp_from_luma(qp, offset: int = 0):
    """Traced chroma QP (H.264 Table 8-15)."""
    qp = jnp.asarray(qp, jnp.int32)
    return _CHROMA_QP[jnp.clip(qp + offset, 0, 51)]
