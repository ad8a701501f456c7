"""Microbench: building blocks for the scan-free P-encode restructure.

Measures, at 1080p S=4 on the real chip:
  A. integer full-search SAD field (stride-2 samples, +-8) by static shifts
  B. per-MB 4-plane window extraction via take_along_axis from band48
  C. same extraction via one-hot matmuls (MXU path)
  D. subpel (half+quarter) SAD refine + MC from extracted windows
  E. batched inter luma transform/quant/recon
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

S, H, W = 4, 1088, 1920
R, C = H // 16, W // 16
RNG = np.random.default_rng(0)
PE = 17  # plane pad (>=16 so band48 construction stays static)


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms")
    return out


src = jnp.asarray(RNG.integers(0, 256, (S, H, W), np.uint8))
planes = [
    jnp.asarray(RNG.integers(0, 256, (S, H + 2 * PE, W + 2 * PE), np.uint8))
    for _ in range(4)
]

# ---- A: SAD field by shifts --------------------------------------------
RANGE = 8


@jax.jit
def sad_field(src, ref_pad):
    src2 = src[:, ::2, ::2].astype(jnp.int32)  # [S, H/2, W/2]
    best = None
    idx = 0
    for dy in range(-RANGE, RANGE + 1):
        for dx in range(-RANGE, RANGE + 1):
            r2 = jax.lax.dynamic_slice(
                ref_pad, (0, PE + dy, PE + dx), (S, H, W)
            )[:, ::2, ::2].astype(jnp.int32)
            d = jnp.abs(src2 - r2)
            sad = d.reshape(S, R, 8, C, 8).sum((2, 4))  # [S,R,C]
            key = sad * 512 + idx
            best = key if best is None else jnp.minimum(best, key)
            idx += 1
    code = best % 512
    return best // 512, code // 17 - RANGE, code % 17 - RANGE  # sad, dy, dx


sad, wdy, wdx = timeit("A sad_field 17x17 stride2", sad_field, src, planes[0])

# ---- band48 construction ------------------------------------------------


@jax.jit
def make_band48(pl):
    off0 = PE - 16
    rows = jnp.concatenate(
        [
            pl[:, off0 + 16 * k : off0 + 16 * k + 16 * R, :].reshape(
                S, R, 16, -1
            )
            for k in range(3)
        ],
        axis=2,
    )  # [S, R, 48, Wp]
    cols = jnp.concatenate(
        [
            rows[..., off0 + 16 * k : off0 + 16 * k + 16 * C].reshape(
                S, R, 48, C, 16
            )
            for k in range(3)
        ],
        axis=-1,
    )  # [S, R, 48, C, 48]
    return cols.transpose(0, 1, 3, 2, 4)  # [S, R, C, 48, 48]


bands = timeit(
    "band48 build (4 planes)",
    jax.jit(lambda ps: [make_band48(p) for p in ps]),
    planes,
)

# ---- B: take_along extraction -------------------------------------------
WIN = 18


@jax.jit
def extract_take(bands, wdy, wdx):
    j0 = 15 + wdy  # [S,R,C]
    i0 = 15 + wdx
    ar = jnp.arange(WIN)
    out = []
    for b in bands:
        t = jnp.take_along_axis(
            b, (j0[..., None, None] + ar[:, None]), axis=3
        )  # [S,R,C,18,48]
        t = jnp.take_along_axis(
            t, (i0[..., None, None] + ar[None, :]), axis=4
        )
        out.append(t)
    return jnp.stack(out, axis=3)  # [S,R,C,4,18,18]


win_b = timeit("B take_along windows [S,R,C,4,18,18]", extract_take, bands,
               wdy, wdx)

# ---- C: one-hot matmul extraction ---------------------------------------


@jax.jit
def extract_onehot(bands, wdy, wdx):
    j0 = 15 + wdy
    i0 = 15 + wdx
    ar = jnp.arange(WIN)
    a48 = jnp.arange(48)
    m_r = (j0[..., None, None] + ar[:, None] == a48).astype(jnp.bfloat16)
    m_c = (i0[..., None, None] + ar[:, None] == a48).astype(jnp.bfloat16)
    out = []
    for b in bands:
        t = jnp.einsum(
            "srcyk,srckw->srcyw", m_r, b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        t = jnp.einsum(
            "srcyw,srcxw->srcyx", t.astype(jnp.bfloat16), m_c,
            preferred_element_type=jnp.float32,
        )
        out.append(t.astype(jnp.int32))
    return jnp.stack(out, axis=3)


win_c = timeit("C one-hot matmul windows", extract_onehot, bands, wdy, wdx)
print("   extraction match:",
      bool(jnp.all(win_b.astype(jnp.int32) == win_c)))

# ---- D: subpel refine + MC ----------------------------------------------
# component table indices from golden.inter
from tpuh264.golden.inter import QPEL_TBL  # noqa: E402

_QT = np.zeros((4, 4, 2), np.int32)
for (xf, yf), (c1, c2) in QPEL_TBL.items():
    _QT[xf, yf] = (c1, c2)
_QT = jnp.asarray(_QT)


@jax.jit
def subpel(win, src):
    """win [S,R,C,4,18,18] int32 planes (G,b,h,j) with (0,0) int sample at
    [1,1]; src [S,R,C,16,16]. Half then quarter 3x3 refine, strict <."""
    srcb = src.astype(jnp.int32)

    def mc(mvx, mvy):
        # mv relative to the int winner, in qpel units, range [-3, 3]
        x_int = (mvx >> 2) + 1
        y_int = (mvy >> 2) + 1
        xf = mvx & 3
        yf = mvy & 3
        # components stacked: G,b,h,j at (0,0); G(+1x),G(+1y),b(+1y),h(+1x)
        # gather 17x17 window at (y_int, x_int) via static-offset select:
        # x_int,y_int in {0, 1} relative windows
        def w17(pl, oy, ox):
            base = jnp.stack(
                [
                    jax.lax.dynamic_slice(
                        win[..., pl, :, :],
                        (0, 0, 0, 0, 0),
                        (S, R, C, 18, 18),
                    )
                ],
            )
            del base
            # y_int/x_int are per-MB (0 or 1): select between two static
            # 17x17 slices
            a = win[..., pl, oy : oy + 17, ox : ox + 17]
            b = win[..., pl, oy + 1 : oy + 18, ox : ox + 17]
            sel_y = jnp.where((y_int == 1)[..., None, None], b, a)
            c_ = win[..., pl, oy : oy + 17, ox + 1 : ox + 18]
            d_ = win[..., pl, oy + 1 : oy + 18, ox + 1 : ox + 18]
            sel_y2 = jnp.where((y_int == 1)[..., None, None], d_, c_)
            return jnp.where((x_int == 1)[..., None, None], sel_y2, sel_y)

        wg = w17(0, 0, 0)
        wb = w17(1, 0, 0)
        wh = w17(2, 0, 0)
        wj = w17(3, 0, 0)
        comps = jnp.stack(
            [
                wg[..., :16, :16], wb[..., :16, :16],
                wh[..., :16, :16], wj[..., :16, :16],
                wg[..., :16, 1:17], wg[..., 1:17, :16],
                wb[..., 1:17, :16], wh[..., :16, 1:17],
            ],
            axis=0,
        )
        i1 = _QT[xf, yf, 0]
        i2 = _QT[xf, yf, 1]
        k = jnp.arange(8).reshape(8, 1, 1, 1, 1, 1)
        c1 = jnp.sum(jnp.where(k == i1[None, ..., None, None], comps, 0), 0)
        c2 = jnp.sum(jnp.where(k == i2[None, ..., None, None], comps, 0), 0)
        return (c1 + c2 + 1) >> 1

    zero = jnp.zeros((S, R, C), jnp.int32)
    # full-res SAD at the integer winner
    best_sad = jnp.abs(srcb - mc(zero, zero)).sum((-1, -2))
    bx = zero
    by = zero
    for offs in (
        [(dy, dx) for dy in (-2, 0, 2) for dx in (-2, 0, 2)],
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
    ):
        basex, basey = bx, by
        for dy, dx in offs:
            if (dy, dx) == (0, 0):
                continue
            cx = basex + dx
            cy = basey + dy
            pred = mc(cx, cy)
            s_ = jnp.abs(srcb - pred).sum((-1, -2))
            better = s_ < best_sad
            best_sad = jnp.where(better, s_, best_sad)
            bx = jnp.where(better, cx, bx)
            by = jnp.where(better, cy, by)
    return bx, by, best_sad, mc(bx, by)


src_mbs = src.reshape(S, R, 16, C, 16).transpose(0, 1, 3, 2, 4)
bx, by, bs, pred = timeit("D subpel refine+MC (16 cands)", subpel,
                          win_b.astype(jnp.int32), src_mbs)

# ---- E: batched inter transform -----------------------------------------
from tpuh264.kernels.pframe import _transform_inter_luma  # noqa: E402


@jax.jit
def xform(src, pred, qp):
    return _transform_inter_luma(src.astype(jnp.int32), pred, qp)


timeit("E batched inter luma transform", xform, src_mbs, pred, jnp.int32(32))
