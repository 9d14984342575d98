"""Time the v3 manual kernel with f16-bit (u16) scale planes vs f32.

Answers: is the in-kernel _scales_f32 decode the gap between the probe's
f32-plane step time and the end-to-end bench (which packs f16 planes)?

Usage: [MLX_VLM_TPU_FUSED_MV=z2] python tools/probe_sc16.py [f32|u16]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

MODE = sys.argv[1] if len(sys.argv) > 1 else "u16"


def main():
    import dataclasses

    from mlx_vlm_tpu.ops import fused_decode as fd
    from mlx_vlm_tpu.core.quant import Int4GroupedTensor, _int4_half_width

    L, D, I, nh, nkv, hd, g, C = 28, 3584, 18944, 28, 4, 128, 64, 512

    def shell(n, K):
        n2p = _int4_half_width(n)
        G = K // g
        return Int4GroupedTensor(
            qp=jnp.zeros((L, K, n2p), jnp.uint8),
            sl=jnp.zeros((L, G, 1, n2p), jnp.float32),
            sh=jnp.zeros((L, G, 1, n2p), jnp.float32),
            bl=jnp.zeros((L, G, 1, n2p), jnp.float32),
            bh=jnp.zeros((L, G, 1, n2p), jnp.float32),
            n=n, group_size=g, out_dtype="bfloat16")

    class Args:
        hidden_size = D
        num_attention_heads = nh
        num_key_value_heads = nkv
        rms_norm_eps = 1e-6

    mp = {"layers": {
        "self_attn": {
            "q_proj": {"weight": shell(D, D),
                       "bias": jnp.zeros((L, D), jnp.bfloat16)},
            "k_proj": {"weight": shell(nkv * hd, D),
                       "bias": jnp.zeros((L, nkv * hd), jnp.bfloat16)},
            "v_proj": {"weight": shell(nkv * hd, D),
                       "bias": jnp.zeros((L, nkv * hd), jnp.bfloat16)},
            "o_proj": {"weight": shell(D, D)},
        },
        "mlp": {
            "gate_proj": {"weight": shell(I, D)},
            "up_proj": {"weight": shell(I, D)},
            "down_proj": {"weight": shell(D, I)},
        },
        "input_layernorm": {"weight": jnp.ones((L, D), jnp.bfloat16)},
        "post_attention_layernorm": {"weight": jnp.ones((L, D),
                                                        jnp.bfloat16)},
    }}
    pack = fd.build_fused_pack(mp, Args())
    assert pack is not None
    if MODE == "u16":
        def to_u16(a):
            return jax.lax.bitcast_convert_type(
                a.astype(jnp.float16), jnp.uint16)
        pack = dataclasses.replace(
            pack, qkv_sc=to_u16(pack.qkv_sc), o_sc=to_u16(pack.o_sc),
            gu_sc=to_u16(pack.gu_sc), dn_sc=to_u16(pack.dn_sc))
    nbytes = sum(a.nbytes for a in (
        pack.qkv_qp, pack.qkv_sc, pack.o_qp, pack.o_sc,
        pack.gu_qp, pack.gu_sc, pack.dn_qp, pack.dn_sc))
    print(f"pack bytes: {nbytes/1e9:.3f} GB (scales={MODE}, "
          f"mv={os.environ.get('MLX_VLM_TPU_FUSED_MV', 'deq')})",
          flush=True)

    kc = jnp.zeros((L, 1, nkv, C, hd), jnp.bfloat16)
    vc = jnp.zeros((L, 1, nkv, C, hd), jnp.bfloat16)
    h = jnp.zeros((1, 1, D), jnp.bfloat16)
    cos = jnp.ones((hd // 2,), jnp.float32)
    sin = jnp.zeros((hd // 2,), jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def run(n, pk, h, kc, vc):
        def body(carry, _):
            hh, off = carry
            ho, kn, vn = fd.fused_decode_step_manual(
                pk, hh, cos, sin, kc, vc, off)
            return ((ho * 1e-6).astype(hh.dtype), off), None

        (hh, _), _ = jax.lax.scan(body, (h, jnp.int32(128)), None, length=n)
        return hh[0, 0, 0]

    def go(n):
        r = run(n, pack, h, kc, vc)
        np.asarray(jax.block_until_ready(r))

    t0 = time.time(); go(1); print(f"compile: {time.time()-t0:.0f}s",
                                   flush=True)
    ts = {}
    for n in (2, 6):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter(); go(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    dt = (ts[6] - ts[2]) / 4
    print(f"fused step: {dt*1e3:.3f} ms -> {nbytes/dt/1e9:.0f} GB/s "
          f"({1/dt:.1f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
