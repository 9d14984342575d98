"""Debug the bench parity gate: per-step fused-vs-unfused logit diffs."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np


def main():
    import bench

    # reach into the gate's machinery by re-running its body with prints
    import jax.numpy as jnp
    from mlx_vlm_tpu.core.quant import quantize, to_int4_grouped
    from mlx_vlm_tpu.utils.loader import load_model_from_weights
    from mlx_vlm_tpu.utils.testing import (qwen2_vl_hf_weights,
                                           tiny_qwen2_vl_config)

    cfg = tiny_qwen2_vl_config()
    cfg["hidden_size"] = 256
    cfg["intermediate_size"] = 256
    cfg["num_attention_heads"] = 2
    cfg["num_key_value_heads"] = 2
    cfg["num_hidden_layers"] = 2
    cfg["rope_scaling"] = {"type": "mrope", "mrope_section": [16, 24, 24]}
    cfg["vision_config"]["hidden_size"] = 32
    weights = qwen2_vl_hf_weights(cfg, seed=0)
    rng = np.random.default_rng(1)
    for k in list(weights.keys()):
        if (k.startswith("model.layers.") and k.endswith(".weight")
                and "layernorm" not in k and weights[k].ndim == 2):
            w = rng.standard_normal(weights[k].shape).astype(np.float32) * 0.1
            weights[k] = to_int4_grouped(
                quantize(jnp.asarray(w), bits=4, group_size=64))

    import os

    def step_logits(fused, n_steps=8):
        if fused:
            m = load_model_from_weights(dict(cfg), dict(weights), jnp.float32)
        else:
            os.environ["MLX_VLM_TPU_FUSED_DECODE"] = "0"
            try:
                m = load_model_from_weights(dict(cfg), dict(weights),
                                            jnp.float32)
            finally:
                del os.environ["MLX_VLM_TPU_FUSED_DECODE"]
        D = cfg["hidden_size"]
        e = jnp.asarray(
            np.random.default_rng(3).standard_normal((1, 8, D)) * 0.3,
            jnp.float32)
        lm = m.language_model
        cache = lm.init_cache(1, 128, jnp.float32)
        pos = jnp.arange(8, dtype=jnp.int32)[None]
        logits, cache = m(m.params, e, cache,
                          jnp.broadcast_to(pos, (3, 1, 8)))
        out = [np.asarray(logits[:, -1], np.float32)]
        tok = int(np.argmax(out[-1]))
        for s in range(n_steps - 1):
            emb = lm.embed(m.params["language_model"],
                           jnp.asarray([[tok]], jnp.int32))
            p = jnp.full((3, 1, 1), 8 + s, jnp.int32)
            logits, cache = m(m.params, emb, cache, p)
            out.append(np.asarray(logits[:, 0], np.float32))
            tok = int(np.argmax(out[-1]))
        return np.concatenate(out, axis=0)

    lf = step_logits(True)
    lr = step_logits(False)
    scale = max(1.0, float(np.abs(lr).max()))
    print("scale:", scale)
    for s in range(lf.shape[0]):
        d = np.abs(lf[s] - lr[s]).max()
        top2 = np.sort(lr[s])[-2:]
        print(f"step {s}: maxdiff={d:.4f} margin={top2[1]-top2[0]:.4f} "
              f"argmax f={lf[s].argmax()} r={lr[s].argmax()}")


if __name__ == "__main__":
    main()
