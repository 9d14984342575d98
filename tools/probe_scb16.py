"""Time the fused decode step with f32 vs bf16 scale planes (7B shapes,
zero shells).  bf16 planes remove ~0.4 GB/step of DMA; unlike the u16/f16
experiment their decode is one native VPU convert.

Usage: python tools/probe_scb16.py [f32|bf16]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

which = _sys.argv[1] if len(_sys.argv) > 1 else "bf16"
if which == "bf16":
    _os.environ["MLX_VLM_TPU_PACK_SCB16"] = "1"

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from mlx_vlm_tpu.ops import fused_decode as fd
    from mlx_vlm_tpu.core.quant import Int4GroupedTensor, _int4_half_width

    L, D, I, nh, nkv, hd, g, C = 28, 3584, 18944, 28, 4, 128, 64, 512
    V = 152064

    def shell(n, K, layers=True):
        n2p = _int4_half_width(n)
        G = K // g
        lead = (L,) if layers else ()
        return Int4GroupedTensor(
            qp=jnp.zeros(lead + (K, n2p), jnp.uint8),
            sl=jnp.zeros(lead + (G, 1, n2p), jnp.float32),
            sh=jnp.zeros(lead + (G, 1, n2p), jnp.float32),
            bl=jnp.zeros(lead + (G, 1, n2p), jnp.float32),
            bh=jnp.zeros(lead + (G, 1, n2p), jnp.float32),
            n=n, group_size=g, out_dtype="bfloat16")

    class Args:
        hidden_size = D
        num_attention_heads = nh
        num_key_value_heads = nkv
        rms_norm_eps = 1e-6

    mp = {"layers": {
        "self_attn": {f"{k}_proj": {"weight": shell(n, D)} for k, n in
                      (("q", nh * hd), ("k", nkv * hd), ("v", nkv * hd),
                       ("o", D))},
        "mlp": {f"{k}_proj": {"weight": shell(n, kk)} for k, n, kk in
                (("gate", I, D), ("up", I, D), ("down", D, I))},
        "input_layernorm": {"weight": jnp.ones((L, D), jnp.float32)},
        "post_attention_layernorm": {
            "weight": jnp.ones((L, D), jnp.float32)},
    }}
    mp["layers"]["self_attn"]["q_proj"]["bias"] = jnp.zeros((L, nh * hd))
    mp["layers"]["self_attn"]["k_proj"]["bias"] = jnp.zeros((L, nkv * hd))
    mp["layers"]["self_attn"]["v_proj"]["bias"] = jnp.zeros((L, nkv * hd))

    head = shell(V, D, layers=False)
    norm = jnp.ones(D, jnp.float32)

    pack = fd.build_fused_pack(mp, Args, lm_head=head, final_norm=norm)
    assert pack is not None
    print(f"{which}: qkv_sc dtype {pack.qkv_sc.dtype}", flush=True)

    k = jnp.zeros((L, 1, nkv, C, hd), jnp.bfloat16)
    v = jnp.zeros((L, 1, nkv, C, hd), jnp.bfloat16)
    h = jnp.zeros((1, 1, D), jnp.float32)
    cos = jnp.ones((hd // 2,), jnp.float32)
    sin = jnp.zeros((hd // 2,), jnp.float32)

    def scan_steps(pk, h, k, v, n=32):
        def body(carry, _):
            h, = carry
            outs = fd.fused_decode_step_manual(
                pk, h, cos, sin, k, v, jnp.asarray(64, jnp.int32))
            return (outs[0],), (outs[3][:, :8] if len(outs) > 3
                                else outs[0][:, 0, :8])
        (hf,), ys = jax.lax.scan(body, (h,), None, length=n)
        return hf, ys

    f = jax.jit(scan_steps)
    t0 = time.time()
    r = f(pack, h, k, v)
    jax.block_until_ready(r)
    print(f"{which} compile: {time.time() - t0:.0f}s", flush=True)
    N = 3
    t0 = time.time()
    for _ in range(N):
        r = f(pack, h, k, v)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / (N * 32) * 1000
    print(f"{which}: {ms:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
