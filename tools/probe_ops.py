"""Isolate Mosaic op support: int8 dots, int4 casts, lane slicing."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dims = (((1,), (0,)), ((), ()))


def tryk(name, kern, *args, out_shape):
    try:
        out = pl.pallas_call(kern, out_shape=out_shape)(*args)
        jax.block_until_ready(out)
        print(f"OK   {name}: {np.asarray(out).ravel()[:3]}")
    except Exception as e:  # noqa
        msg = str(e)
        for line in msg.splitlines():
            if "Not implemented" in line or "Unsupported" in line or \
               "unsupported" in line or "NotImplemented" in line:
                msg = line.strip()
                break
        print(f"FAIL {name}: {msg[:140]}")


rng = np.random.default_rng(0)
x8 = jnp.array(rng.integers(-50, 50, (8, 64)), jnp.int8)
w8 = jnp.array(rng.integers(-8, 8, (64, 512)), jnp.int8)
f = jax.ShapeDtypeStruct((8, 512), jnp.float32)

# 1. plain int8 dot -> i32
tryk("i8dot", lambda a, b, o: o.__setitem__(
    slice(None), jax.lax.dot_general(
        a[:], b[:], dims, preferred_element_type=jnp.int32
    ).astype(jnp.float32)), x8, w8, out_shape=f)

# 2. int8 from int32 conversion then dot
x32 = jnp.array(rng.integers(-50, 50, (8, 64)), jnp.int32)
w32 = jnp.array(rng.integers(-8, 8, (64, 512)), jnp.int32)
tryk("i32->i8 dot", lambda a, b, o: o.__setitem__(
    slice(None), jax.lax.dot_general(
        a[:].astype(jnp.int8), b[:].astype(jnp.int8), dims,
        preferred_element_type=jnp.int32
    ).astype(jnp.float32)), x32, w32, out_shape=f)

# 3. uint4 casts
q4 = jnp.array(rng.integers(0, 15, (64, 512)), jnp.uint8).astype(jnp.uint4)
for tgt in ("int32", "float32", "bfloat16", "int8", "uint8"):
    tdt = getattr(jnp, tgt)
    tryk(f"u4->{tgt}", lambda a, o, tdt=tdt: o.__setitem__(
        slice(None), a[:].astype(tdt).astype(jnp.float32)[:8, :]),
        q4, out_shape=f)

i4 = jnp.array(rng.integers(-8, 7, (64, 512)), jnp.int8).astype(jnp.int4)
for tgt in ("int32", "bfloat16"):
    tdt = getattr(jnp, tgt)
    tryk(f"i4->{tgt}", lambda a, o, tdt=tdt: o.__setitem__(
        slice(None), a[:].astype(tdt).astype(jnp.float32)[:8, :]),
        i4, out_shape=f)

# 4. i4 dot direct
tryk("i4 x bf16 dot", lambda a, b, o: o.__setitem__(
    slice(None), jax.lax.dot_general(
        b[:, :64].astype(jnp.bfloat16), a[:].astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32)),
    i4, jnp.ones((8, 512), jnp.bfloat16), out_shape=f)

# 5. f32 lane slice at 64 offset + dot
xf = jnp.array(rng.standard_normal((8, 3584)), jnp.float32)
wf = jnp.array(rng.standard_normal((64, 512)), jnp.bfloat16)
tryk("lane-slice64 dot", lambda a, b, o: o.__setitem__(
    slice(None), jax.lax.dot_general(
        a[:, 64:128].astype(jnp.bfloat16), b[:], dims,
        preferred_element_type=jnp.float32)), xf, wf, out_shape=f)

# 6. sublane slice of u8 at 64 + unpack + dot
qu = jnp.array(rng.integers(0, 255, (3584, 512)), jnp.uint8)
def k6(a, b, o):
    blk = a[64:128, :]
    lo = (blk.astype(jnp.int32) & 0xF).astype(jnp.bfloat16)
    o[:] = jax.lax.dot_general(b[:, :64].astype(jnp.bfloat16), lo, dims,
                               preferred_element_type=jnp.float32)
tryk("sublane-slice u8 unpack dot", k6, qu, xf[:, :512], out_shape=f)

# 7. i16 dot
x16 = x32.astype(jnp.int16)
w16 = w32.astype(jnp.int16)
tryk("i16dot", lambda a, b, o: o.__setitem__(
    slice(None), jax.lax.dot_general(
        a[:], b[:], dims, preferred_element_type=jnp.int32
    ).astype(jnp.float32)), x16, w16, out_shape=f)
