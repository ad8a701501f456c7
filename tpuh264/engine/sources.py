"""Deterministic synthetic frame sources.

The reference tests exclusively against a live camera
(/root/reference/scripts/app.js:245-247) -- no synthetic or recorded
inputs, which SURVEY.md section 4 flags as the gap to close.  These
sources are seeded and frame-indexed, so every benchmark and test is
reproducible bit-for-bit.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def yuv_frame(
    width: int, height: int, t: int, kind: str = "moving_gradient", seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One I420 frame [H,W]+[H/2,W/2]x2 int32, deterministic in (t, seed)."""
    rng = np.random.default_rng(seed * 1_000_003 + t)
    yy, xx = np.mgrid[0:height, 0:width]
    if kind == "moving_gradient":
        y = ((xx * 2 + yy + t * 7) % 256 + rng.integers(0, 8, (height, width)))
        y = y.clip(0, 255)
    elif kind == "rigid":
        # camera-like rigid motion (one (2,1) px/frame field for all
        # planes; see _device_source_gop for rationale)
        xf = xx - 2.0 * t
        yf = yy - 1.0 * t
        y = (
            128.0
            + 46.0 * np.sin(xf / 17.0) * np.cos(yf / 23.0)
            + 34.0 * np.sin((xf + yf) / 7.1)
            + 18.0 * np.cos(xf / 3.3) * np.sin(yf / 4.7)
        ).clip(0, 255)
        x2 = xx[::2, ::2] - 1.0 * t
        y2 = yy[::2, ::2] - 0.5 * t
        u = (128.0 + 44.0 * np.sin(x2 / 19.0) * np.cos(y2 / 13.0))
        v = (128.0 + 44.0 * np.cos(x2 / 11.0) * np.sin(y2 / 29.0))
        return (
            np.asarray(y, np.int32),
            u.clip(0, 255).astype(np.int32),
            v.clip(0, 255).astype(np.int32),
        )
    elif kind == "colorbars":
        y = ((xx * 8 // max(width, 1)) * 32 + 16 + (t % 2)).clip(0, 235)
    elif kind == "noise":
        y = rng.integers(0, 256, (height, width))
    elif kind == "checker":
        y = (((xx // 32 + yy // 32 + t) % 2) * 200 + 28)
    else:
        raise ValueError(kind)
    u = (128 + 48 * np.sin((xx[::2, ::2] + t * 3) / 37.0)).astype(np.int64)
    v = (128 + 48 * np.cos((yy[::2, ::2] - t * 5) / 29.0)).astype(np.int64)
    return (
        np.asarray(y, np.int32),
        u.clip(0, 255).astype(np.int32),
        v.clip(0, 255).astype(np.int32),
    )


def rgba_frame(
    width: int, height: int, t: int, kind: str = "moving_gradient", seed: int = 0
) -> np.ndarray:
    """One RGBA frame [H, W, 4] uint8 (camera-like input for encode_frame)."""
    y, u, v = yuv_frame(width, height, t, kind, seed)
    r = np.clip(y + 30 * ((t % 7) - 3) // 3, 0, 255)
    g = np.clip(y, 0, 255)
    b = np.clip(255 - y, 0, 255)
    a = np.full_like(r, 255)
    return np.stack([r, g, b, a], axis=-1).astype(np.uint8)


import functools


@functools.lru_cache(maxsize=None)
def _device_source(width: int, height: int, streams: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(t):
        s = jnp.arange(streams, dtype=jnp.int32)[:, None, None]
        yy = jnp.arange(height, dtype=jnp.int32)[None, :, None]
        xx = jnp.arange(width, dtype=jnp.int32)[None, None, :]
        y = ((xx * 2 + yy + t * 7 + s * 37) % 256).astype(jnp.uint8)
        yy2 = yy[:, ::2, :]
        xx2 = xx[:, :, ::2]
        u = (128 + 47 * jnp.sin((xx2 + t * 3 + s * 11) / 37.0)).astype(jnp.uint8)
        v = (128 + 47 * jnp.cos((yy2 - t * 5 + s * 13) / 29.0)).astype(jnp.uint8)
        u = jnp.broadcast_to(u, (streams, height // 2, width // 2))
        v = jnp.broadcast_to(v, (streams, height // 2, width // 2))
        y = jnp.broadcast_to(y, (streams, height, width))
        return y, u, v

    return gen


def _hash_noise(jnp, *terms):
    """Cheap on-device integer-hash noise in [0, 256) (int32 wraparound)."""
    h = sum(t * m for t, m in zip(terms, (1664525, 1013904223, 69069)))
    h = jnp.asarray(h, jnp.int32)
    h = h ^ (h >> 13)
    h = h * 1103515245 + 12345
    h = h ^ (h >> 7)
    return (h & 255).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _device_source_frames(width: int, height: int, k: int,
                          kind: str = "moving_gradient"):
    """Like _device_source, but the batch axis is TIME: element i is the
    content of frame t+i (for multi-frame-per-dispatch pipelines)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(t):
        s = t + jnp.arange(k, dtype=jnp.int32)[:, None, None]
        yy = jnp.arange(height, dtype=jnp.int32)[None, :, None]
        xx = jnp.arange(width, dtype=jnp.int32)[None, None, :]
        if kind == "noise":
            y = _hash_noise(jnp, xx, yy, s)
            u = _hash_noise(jnp, xx[:, :, ::2] + 7, yy[:, ::2, :] + 3, s)
            v = _hash_noise(jnp, xx[:, :, ::2] + 13, yy[:, ::2, :] + 11, s)
        else:
            y = ((xx * 2 + yy + s * 7) % 256).astype(jnp.uint8)
            yy2 = yy[:, ::2, :]
            xx2 = xx[:, :, ::2]
            u = (128 + 47 * jnp.sin((xx2 + s * 3) / 37.0)).astype(jnp.uint8)
            v = (128 + 47 * jnp.cos((yy2 - s * 5) / 29.0)).astype(jnp.uint8)
        u = jnp.broadcast_to(u, (k, height // 2, width // 2))
        v = jnp.broadcast_to(v, (k, height // 2, width // 2))
        y = jnp.broadcast_to(y, (k, height, width))
        return y, u, v

    return gen


@functools.lru_cache(maxsize=None)
def _device_source_gop(width: int, height: int, k: int, streams: int,
                       kind: str = "moving_gradient"):
    """Batch axes TIME x STREAM: [k, streams, H, W] uint8 planes, frame
    t+i of stream s has per-stream phase offsets (independent content).

    kind="rigid": camera-like content -- a smooth multi-scale luminance
    field and chroma fields all translating with ONE rigid motion
    ((2, 1) luma px/frame, inside the ME range), the way real captured
    scenes move.  The legacy "moving_gradient" drifts luma and chroma
    in different directions, which no 4:2:0 codec can track (chroma MVs
    are luma/2 by definition, 8.4.1.4) -- adversarial for rate tests."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(t):
        ti = t + jnp.arange(k, dtype=jnp.int32)[:, None, None, None]
        si = jnp.arange(streams, dtype=jnp.int32)[None, :, None, None]
        yy = jnp.arange(height, dtype=jnp.int32)[None, None, :, None]
        xx = jnp.arange(width, dtype=jnp.int32)[None, None, None, :]
        if kind == "rigid":
            xf = (xx - 2.0 * ti).astype(jnp.float32)
            yf = (yy - 1.0 * ti).astype(jnp.float32)
            ph = si.astype(jnp.float32) * 1.7
            y = (
                128.0
                + 46.0 * jnp.sin(xf / 17.0 + ph) * jnp.cos(yf / 23.0)
                + 34.0 * jnp.sin((xf + yf) / 7.1 + ph)
                + 18.0 * jnp.cos(xf / 3.3) * jnp.sin(yf / 4.7 + ph)
            )
            y = jnp.clip(y, 0, 255).astype(jnp.uint8)
            x2 = (xx[..., ::2] - 1.0 * ti).astype(jnp.float32)
            y2 = (yy[:, :, ::2] - 0.5 * ti).astype(jnp.float32)
            u = (128.0 + 44.0 * jnp.sin(x2 / 19.0 + ph)
                 * jnp.cos(y2 / 13.0)).astype(jnp.uint8)
            v = (128.0 + 44.0 * jnp.cos(x2 / 11.0 - ph)
                 * jnp.sin(y2 / 29.0)).astype(jnp.uint8)
        elif kind == "noise":
            y = _hash_noise(jnp, xx + si * 97, yy, ti)
            u = _hash_noise(
                jnp, xx[..., ::2] + si * 97 + 7, yy[:, :, ::2] + 3, ti
            )
            v = _hash_noise(
                jnp, xx[..., ::2] + si * 97 + 13, yy[:, :, ::2] + 11, ti
            )
        else:
            y = ((xx * 2 + yy + ti * 7 + si * 37) % 256).astype(jnp.uint8)
            yy2 = yy[:, :, ::2, :]
            xx2 = xx[:, :, :, ::2]
            u = (128 + 47 * jnp.sin((xx2 + ti * 3 + si * 11) / 37.0)).astype(
                jnp.uint8
            )
            v = (128 + 47 * jnp.cos((yy2 - ti * 5 + si * 13) / 29.0)).astype(
                jnp.uint8
            )
        shape2 = (k, streams, height // 2, width // 2)
        return (
            jnp.broadcast_to(y, (k, streams, height, width)),
            jnp.broadcast_to(u, shape2),
            jnp.broadcast_to(v, shape2),
        )

    return gen


def device_yuv_frame(width: int, height: int, t, streams: int = 1):
    """Deterministic synthetic frames generated ON DEVICE (uint8 planes).

    The capture source runs where the pixels already are -- the analog of
    the reference's frames arriving in browser memory before encode.  `t`
    is traced, so successive frames reuse one compilation.
    """
    import jax.numpy as jnp

    return _device_source(width, height, streams)(jnp.int32(t))


# -- file sources (Y4M) -------------------------------------------------------
# The reference only ever encodes live camera frames (app.js:245-247);
# real deployments encode FILES too, and the north star's RD comparisons
# need recorded clips.  YUV4MPEG2 is the interchange format every
# standard test clip (Akiyo, Foreman, ...) ships in.


def write_y4m(path: str, frames, fps: int = 30) -> None:
    """Write I420 frames [(y, u, v)] as a YUV4MPEG2 file."""
    y0 = np.asarray(frames[0][0])
    h, w = y0.shape
    with open(path, "wb") as f:
        f.write(
            f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
        )
        for (y, u, v) in frames:
            f.write(b"FRAME\n")
            f.write(np.asarray(y, np.uint8).tobytes())
            f.write(np.asarray(u, np.uint8).tobytes())
            f.write(np.asarray(v, np.uint8).tobytes())


def read_y4m(path: str, max_frames: int = 0):
    """Read a YUV4MPEG2 (8-bit 4:2:0) file -> [(y, u, v)] int32 planes.

    Accepts the C420/C420jpeg/C420mpeg2/C420paldv chroma taggings (all
    are 8-bit 2x2-subsampled layouts; siting differences do not change
    the sample container).  Interlaced or non-4:2:0 files are rejected.
    """
    with open(path, "rb") as f:
        header = f.readline().decode("ascii", "replace").strip()
        if not header.startswith("YUV4MPEG2"):
            raise ValueError("not a YUV4MPEG2 file")
        w = h = None
        for tok in header.split()[1:]:
            if tok.startswith("W"):
                w = int(tok[1:])
            elif tok.startswith("H"):
                h = int(tok[1:])
            elif tok.startswith("C") and not tok.startswith("C420"):
                raise NotImplementedError(f"chroma {tok} (4:2:0 only)")
            elif tok.startswith("I") and tok not in ("Ip", "I?"):
                raise NotImplementedError("interlaced Y4M")
        if not w or not h:
            raise ValueError("Y4M header missing W/H")
        frames = []
        ylen, clen = w * h, (w // 2) * (h // 2)
        while True:
            line = f.readline()
            if not line:
                break
            if not line.startswith(b"FRAME"):
                raise ValueError("bad FRAME marker")
            raw = f.read(ylen + 2 * clen)
            if len(raw) < ylen + 2 * clen:
                break
            y = np.frombuffer(raw, np.uint8, ylen).reshape(h, w)
            u = np.frombuffer(raw, np.uint8, clen, ylen).reshape(
                h // 2, w // 2
            )
            v = np.frombuffer(raw, np.uint8, clen, ylen + clen).reshape(
                h // 2, w // 2
            )
            frames.append((
                y.astype(np.int32), u.astype(np.int32),
                v.astype(np.int32),
            ))
            if max_frames and len(frames) >= max_frames:
                break
    return frames


def clip_frames(width: int, height: int, n: int, kind: str = "meeting",
                seed: int = 0):
    """Camera-like synthetic CLIPS for RD measurement: richer than the
    per-frame sources above (textured regions, independently moving
    foreground, sensor noise), deterministic, any resolution.

    These stand in for standard test clips in the build environment,
    which has no network egress to fetch Akiyo/Foreman et al.; real
    clips go through read_y4m on the same code path.
    """
    rng = np.random.default_rng(seed * 7 + 13)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    # static textured background (smoothed noise + structure)
    bg = rng.normal(0, 1, (height + 64, width + 64)).astype(np.float32)
    for _ in range(3):  # cheap separable smoothing
        bg = (bg + np.roll(bg, 1, 0) + np.roll(bg, -1, 0)
              + np.roll(bg, 1, 1) + np.roll(bg, -1, 1)) / 5.0
    bg = 110 + 70 * bg / max(np.abs(bg).max(), 1e-6)
    bg += 25 * np.sin(np.mgrid[0:height + 64, 0:width + 64][1] / 41.0)
    out = []
    for t in range(n):
        if kind == "meeting":
            # slow global drift + a larger talking-head-like ellipse
            # moving independently + slight luma flicker
            gx, gy = 0.7 * t, 0.3 * t
            y = bg[int(gy):int(gy) + height, int(gx):int(gx) + width].copy()
            cx = width * 0.5 + 14 * np.sin(t / 6.0)
            cy = height * 0.55 + 6 * np.cos(t / 9.0)
            d2 = ((xx - cx) / (0.16 * width)) ** 2 + (
                (yy - cy) / (0.3 * height)) ** 2
            obj = 150 + 40 * np.sin((xx - cx) / 9.0) * np.cos(
                (yy - cy) / 11.0)
            y = np.where(d2 < 1.0, obj, y) + 1.5 * np.sin(t / 3.0)
        elif kind == "pan_detail":
            # constant pan over high-detail texture (stress ME + rate)
            gx, gy = 1.8 * t, 0.9 * t
            y = bg[int(gy):int(gy) + height, int(gx):int(gx) + width].copy()
            y += 20 * np.sin((xx + 2.3 * t) / 3.1) * np.cos(yy / 2.7)
        else:
            raise ValueError(kind)
        y += rng.normal(0, 1.2, (height, width))  # sensor noise
        u = 118 + 30 * np.sin((xx[::2, ::2] + 3 * t) / 53.0)
        v = 130 + 26 * np.cos((yy[::2, ::2] + 2 * t) / 47.0)
        out.append((
            np.clip(y, 0, 255).astype(np.int32),
            np.clip(u, 0, 255).astype(np.int32),
            np.clip(v, 0, 255).astype(np.int32),
        ))
    return out
