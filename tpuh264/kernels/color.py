"""RGBA <-> YUV420 conversion kernels (BT.601 integer-exact).

Coefficients bit-match the reference's conversions -- the one component it
implements twice (CPU C++ at /root/reference/openh264_wrapper.cpp:22-64
and GPU WGSL at /root/reference/scripts/wgsl_shaders.js:101-165, which
deliberately reproduces the same integer math, see its comment at
111-114).  We reproduce them a third time, on the TPU VPU:

  Y =  ((  66 R + 129 G +  25 B + 128) >> 8) + 16
  U =  (( -38 R -  74 G + 112 B + 128) >> 8) + 128
  V =  (( 112 R -  94 G -  18 B + 128) >> 8) + 128

Chroma is taken from the *top-left pixel of each 2x2 block* (no
averaging), matching openh264_wrapper.cpp:34-37.

The inverse (decode side, openh264_wrapper.cpp:149-195):
  C = Y - 16, D = U - 128, E = V - 128
  R = clip((298 C + 409 E + 128) >> 8)
  G = clip((298 C - 100 D - 208 E + 128) >> 8)
  B = clip((298 C + 516 D + 128) >> 8)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def rgba_to_yuv420(rgba: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[..., H, W, 4] uint8/int -> (Y [...,H,W], U, V [...,H/2,W/2]) int32."""
    x = rgba.astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    # chroma from top-left of each 2x2 block (reference behavior)
    r2 = r[..., ::2, ::2]
    g2 = g[..., ::2, ::2]
    b2 = b[..., ::2, ::2]
    u = ((-38 * r2 - 74 * g2 + 112 * b2 + 128) >> 8) + 128
    v = ((112 * r2 - 94 * g2 - 18 * b2 + 128) >> 8) + 128
    return y, u, v


@jax.jit
def yuv420_to_rgba(
    y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """(Y [...,H,W], U, V [...,H/2,W/2]) -> [..., H, W, 4] uint8 RGBA."""
    c = y.astype(jnp.int32) - 16
    # nearest-neighbor chroma upsample (matches the reference's indexing
    # uv_index = (y/2)*w/2 + x/2, openh264_wrapper.cpp:168-170)
    d = jnp.repeat(jnp.repeat(u.astype(jnp.int32) - 128, 2, axis=-1), 2, axis=-2)
    e = jnp.repeat(jnp.repeat(v.astype(jnp.int32) - 128, 2, axis=-1), 2, axis=-2)
    d = d[..., : y.shape[-2], : y.shape[-1]]
    e = e[..., : y.shape[-2], : y.shape[-1]]
    r = jnp.clip((298 * c + 409 * e + 128) >> 8, 0, 255)
    g = jnp.clip((298 * c - 100 * d - 208 * e + 128) >> 8, 0, 255)
    b = jnp.clip((298 * c + 516 * d + 128) >> 8, 0, 255)
    a = jnp.full_like(r, 255)
    return jnp.stack([r, g, b, a], axis=-1).astype(jnp.uint8)


def rgba_to_yuv420_ref(rgba):
    """numpy scalar-reference (mirrors openh264_wrapper.cpp:22-40)."""
    import numpy as np

    x = np.asarray(rgba, np.int64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    r2, g2, b2 = r[..., ::2, ::2], g[..., ::2, ::2], b[..., ::2, ::2]
    u = ((-38 * r2 - 74 * g2 + 112 * b2 + 128) >> 8) + 128
    v = ((112 * r2 - 94 * g2 - 18 * b2 + 128) >> 8) + 128
    return y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)
