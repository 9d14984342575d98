"""Decompose the production-vs-probe decode gap (7B shapes).

Times three scans (32 steps each) on-chip:
  A step-only          — fused kernel, constant KV (probe_fused baseline)
  B + cache threading  — kernel output written into the full [L,B,H,C,D]
                         cache carried through the scan (production-style)
  C + lm head          — plus int4_matvec lm_head, log_softmax, argmax

Usage: [V3=1] python tools/probe_prod_gap.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from mlx_vlm_tpu.ops import fused_decode as fd
    from mlx_vlm_tpu.core.quant import Int4GroupedTensor, _int4_half_width

    L, D, I, nh, nkv, hd, g, C = 28, 3584, 18944, 28, 4, 128, 64, 512
    V = 152064

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

    def head_shell(n, K):
        n2p = _int4_half_width(n)
        G = K // g
        return Int4GroupedTensor(
            qp=jnp.zeros((K, n2p), jnp.uint8),
            sl=jnp.zeros((G, 1, n2p), jnp.float32),
            sh=jnp.zeros((G, 1, n2p), jnp.float32),
            bl=jnp.zeros((G, 1, n2p), jnp.float32),
            bh=jnp.zeros((G, 1, n2p), jnp.float32),
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
        "post_attention_layernorm": {"weight": jnp.ones((L, D), jnp.bfloat16)},
    }}
    pack = fd.build_fused_pack(mp, Args())
    head = head_shell(V, D)

    kc = jnp.zeros((L, 1, nkv, C, hd), jnp.bfloat16)
    vc = jnp.zeros((L, 1, nkv, C, hd), jnp.bfloat16)
    h0 = jnp.zeros((1, 1, D), jnp.bfloat16)
    cos = jnp.ones((hd // 2,), jnp.float32)
    sin = jnp.zeros((hd // 2,), jnp.float32)
    fnorm = jnp.ones((D,), jnp.bfloat16)

    step_fn = (fd.fused_decode_step_manual
               if os.environ.get("V3", "0") == "1" else fd.fused_decode_step)

    def core(pk, hh, kcc, vcc, off):
        return step_fn(pk, hh, cos, sin, kcc, vcc, off)

    def final_norm(ho):
        xf = ho.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + 1e-6)
                * fnorm.astype(jnp.float32)).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=0)
    def run_a(n, pk, h, kcc, vcc):
        def body(carry, _):
            hh, off = carry
            ho, kn, vn = core(pk, hh, kcc, vcc, off)
            return ((ho * 1e-6).astype(hh.dtype), off), None
        (hh, _), _ = jax.lax.scan(body, (h, jnp.int32(128)), None, length=n)
        return hh[0, 0, 0]

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(3, 4))
    def run_b(n, pk, h, kcc, vcc):
        def body(carry, _):
            hh, kcc, vcc, off = carry
            ho, kn, vn = core(pk, hh, kcc, vcc, off)
            zero = jnp.zeros((), jnp.int32)
            idx = (zero, zero, zero, off, zero)
            kcc = jax.lax.dynamic_update_slice(
                kcc, kn[:, :nkv].reshape(L, 1, nkv, 1, hd
                                         ).astype(kcc.dtype), idx)
            vcc = jax.lax.dynamic_update_slice(
                vcc, vn[:, :nkv].reshape(L, 1, nkv, 1, hd
                                         ).astype(vcc.dtype), idx)
            return ((ho * 1e-6).astype(hh.dtype), kcc, vcc, off + 1), None
        (hh, *_), _ = jax.lax.scan(body, (h, kcc, vcc, jnp.int32(128)),
                                   None, length=n)
        return hh[0, 0, 0]

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(3, 4))
    def run_c(n, pk, h, kcc, vcc):
        from mlx_vlm_tpu.ops.int4_matvec import int4_matvec

        def body(carry, _):
            hh, kcc, vcc, off = carry
            ho, kn, vn = core(pk, hh, kcc, vcc, off)
            zero = jnp.zeros((), jnp.int32)
            idx = (zero, zero, zero, off, zero)
            kcc = jax.lax.dynamic_update_slice(
                kcc, kn[:, :nkv].reshape(L, 1, nkv, 1, hd
                                         ).astype(kcc.dtype), idx)
            vcc = jax.lax.dynamic_update_slice(
                vcc, vn[:, :nkv].reshape(L, 1, nkv, 1, hd
                                         ).astype(vcc.dtype), idx)
            hn = final_norm(ho)
            logits = int4_matvec(hn.reshape(1, D), head).astype(jnp.float32)
            lp = jax.nn.log_softmax(logits, axis=-1)
            nxt = jnp.argmax(lp, axis=-1)
            return ((ho * 1e-6 + nxt[0] * 0.0).astype(hh.dtype),
                    kcc, vcc, off + 1), None
        (hh, *_), _ = jax.lax.scan(body, (h, kcc, vcc, jnp.int32(128)),
                                   None, length=n)
        return hh[0, 0, 0]

    def timeit(name, fn):
        def go(n):
            r = fn(n, pack, h0, jnp.copy(kc), jnp.copy(vc))
            np.asarray(jax.block_until_ready(r))
        t0 = time.time(); go(1)
        print(f"{name} compile: {time.time()-t0:.0f}s", flush=True)
        ts = {}
        for n in (2, 10):
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter(); go(n)
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        dt = (ts[10] - ts[2]) / 8
        print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)

    timeit("A step-only", run_a)
    timeit("B +cache", run_b)
    timeit("C +head", run_c)


if __name__ == "__main__":
    main()
