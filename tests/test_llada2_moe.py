"""LLaDA2-MoE: fused-qkv sanitize split + MoE diffusion demasking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.diffusion import (diffusion_generate,
                                            is_diffusion_model)
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_glm4_moe import hf_weights as moe_weights
from test_glm4_moe import tiny_cfg as glm_tiny_cfg


def tiny_cfg(**over):
    cfg = glm_tiny_cfg()
    cfg.update({
        "model_type": "llada2_moe",
        "num_experts": cfg.pop("n_routed_experts"),
        "num_shared_experts": cfg.pop("n_shared_experts"),
        "rotary_dim": 4,
        "use_qk_norm": True,
        "use_qkv_bias": True,
        "mask_token_id": 159,
        "rope_theta": 600000.0,
    })
    cfg.pop("partial_rotary_factor")
    cfg.update(over)
    return cfg


def fused_weights(cfg, seed=0):
    """glm4_moe-style weights re-expressed in llada2 checkpoint naming."""
    base = dict(cfg, n_routed_experts=cfg["num_experts"],
                n_shared_experts=cfg["num_shared_experts"],
                partial_rotary_factor=cfg["rotary_dim"] / cfg["head_dim"])
    w = moe_weights(base, seed)
    out = {}
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}.self_attn."
        qw = w.pop(p + "q_proj.weight")
        kw = w.pop(p + "k_proj.weight")
        vw = w.pop(p + "v_proj.weight")
        out[p + "query_key_value.weight"] = np.concatenate([qw, kw, vw])
        qb = w.pop(p + "q_proj.bias")
        kb = w.pop(p + "k_proj.bias")
        vb = w.pop(p + "v_proj.bias")
        out[p + "query_key_value.bias"] = np.concatenate([qb, kb, vb])
        ow = w.pop(p + "o_proj.weight")
        out[p + "dense.weight"] = ow
        out[p + "query_layernorm.weight"] = w.pop(p + "q_norm.weight")
        out[p + "key_layernorm.weight"] = w.pop(p + "k_norm.weight")
    for k, v in list(w.items()):
        k2 = k.replace("mlp.gate.e_score_correction_bias",
                       "mlp.gate.expert_bias")
        out[k2] = v
    return out


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    return load_model_from_weights(cfg, fused_weights(cfg), jnp.float32)


class _Tok:
    eos_token_id = 2

    def decode(self, ids, **kw):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def __call__(self, text, **kw):
        ids = [(ord(c) * 3) % 150 for c in str(text)][:12]
        return {"input_ids": np.asarray([ids]),
                "attention_mask": np.ones((1, len(ids)), np.int64)}


class _Proc:
    tokenizer = _Tok()

    def __call__(self, text=None, **kw):
        return self.tokenizer(text[0] if isinstance(text, list) else text)


class TestLlada2Moe:
    def test_detection(self, model):
        assert is_diffusion_model(model)

    def test_qkv_split_matches_glm4_moe(self):
        """The fused checkpoint must produce the same logits as the same
        weights loaded through the split glm4_moe layout."""
        cfg = tiny_cfg()
        m = load_model_from_weights(cfg, fused_weights(cfg, 5), jnp.float32)
        base = dict(cfg, model_type="glm4_moe",
                    n_routed_experts=cfg["num_experts"],
                    n_shared_experts=cfg["num_shared_experts"],
                    partial_rotary_factor=cfg["rotary_dim"]
                    / cfg["head_dim"])
        ref = load_model_from_weights(base, moe_weights(base, 5),
                                      jnp.float32)
        ids = (np.arange(6, dtype=np.int32) * 11 % 150)[None]
        def logits(mm):
            e = jax.jit(mm.get_input_embeddings)(mm.params,
                                                 jnp.asarray(ids))
            pos = np.arange(6, dtype=np.int32)[None]
            l, _ = mm(mm.params, e, None, jnp.asarray(pos))
            return np.asarray(l)
        np.testing.assert_allclose(logits(m), logits(ref), atol=1e-5)

    def test_diffusion_generate(self, model):
        res = diffusion_generate(model, _Proc(), "hello there",
                                 max_tokens=8, steps=4, block_length=4)
        assert isinstance(res.text, str) and len(res.text) > 0
