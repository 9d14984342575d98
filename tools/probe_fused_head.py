"""Time the fused decode step WITH vs WITHOUT the in-kernel lm_head
(7B shapes, zero shells): the head phase should add ~the head-weight DMA
(~0.5 ms) instead of the standalone int4_matvec's ~1.2 ms.

Usage: python tools/probe_fused_head.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main(which="both"):
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

    variants = [("no-head", None), ("fused-head", head)]
    if which != "both":
        variants = [v for v in variants if v[0] == which]
    for label, lm_head in variants:
        pack = fd.build_fused_pack(mp, Args, lm_head=lm_head,
                                   final_norm=norm)
        assert pack is not None
        if lm_head is not None:
            assert pack.hd_qp is not None, "head did not pack"
            print("NH tiles:", pack.hd_qp.shape, "nhd2", pack.nhd2,
                  "pad", pack.nhd2_pad)
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
        print(f"{label} compile: {time.time()-t0:.0f}s", flush=True)
        N = 3
        t0 = time.time()
        for _ in range(N):
            r = f(pack, h, k, v)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / (N * 32) * 1000
        print(f"{label}: {ms:.3f} ms/step", flush=True)


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
