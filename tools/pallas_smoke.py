import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    x = x_ref[:]
    # ops the CAVLC kernel needs: shifts, clz, compares, bool, select
    sh = jnp.clip(x & 7, 0, 31)
    a = jax.lax.shift_right_logical(x, sh)
    b = x << jnp.clip(8 - sh, 0, 31)
    c = jax.lax.clz(x | 1)
    o_ref[:] = (a | b) + c + jnp.where(x > 5, 1, 0)


x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x)
import numpy as np
xn = np.arange(8 * 128, dtype=np.int64).reshape(8, 128)
sh = xn & 7
ref = ((xn >> sh) | (xn << np.clip(8 - sh, 0, 31))) & 0xFFFFFFFF
ref = ref.astype(np.int64)
clz = np.array([32 - int(v | 1).bit_length() for v in xn.reshape(-1)]).reshape(8, 128)
ref = (ref + clz + (xn > 5)).astype(np.int32)
print("match:", np.array_equal(np.asarray(out), ref))

# grid + multi-dim blocks like the real kernel will use
def k2(lv_ref, o_ref):
    acc = jnp.zeros((8, 128), jnp.int32)
    for j in range(16):
        acc = acc + lv_ref[j]
    o_ref[:] = acc

lv = jnp.arange(16 * 32 * 128, dtype=jnp.int32).reshape(16, 32, 128)
o = pl.pallas_call(
    k2,
    grid=(4,),
    in_specs=[pl.BlockSpec((16, 8, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
)(lv)
print("grid sum match:", bool(jnp.all(o == lv.sum(0))))
