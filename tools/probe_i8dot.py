"""Quick check: does Mosaic support batched int8 dot_general + u8 nibble ops?"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

gt, M, g, TN = 56, 8, 64, 384


def kern(q_ref, x_ref, o_ref):
    q = q_ref[:]                       # [gt*g, TN] u8
    lo = (q & 0xF).astype(jnp.int8).reshape(gt, g, TN)
    xr = x_ref[:].reshape(M, gt, g).transpose(1, 0, 2).astype(jnp.int8)
    p = jax.lax.dot_general(
        xr, lo, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)  # [gt, M, TN]
    o_ref[:] = jnp.sum(p.astype(jnp.float32), axis=0)


def main():
    q = jnp.array(np.random.randint(0, 255, (gt * g, TN)), jnp.uint8)
    x = jnp.array(np.random.randint(-10, 10, (M, gt * g)), jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, TN), jnp.float32),
    )(q, x)
    ref = (x.astype(jnp.int32) @ (q.astype(jnp.int32) & 0xF)).astype(jnp.float32)
    print("max err:", float(jnp.max(jnp.abs(out - ref))))


if __name__ == "__main__":
    main()
