"""nemotron_labs_diffusion: ministral3-shaped decoder + diffusion canvas."""

import numpy as np

import jax.numpy as jnp

from mlx_vlm_tpu.generate.diffusion import (is_diffusion_model,
                                            stream_diffusion_generate)
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_text_tranche4 import _llama_like_weights, _rng_rand


class _Tok:
    eos_token_id = 90

    def decode(self, ids, **kw):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def __call__(self, text, **kw):
        ids = [(ord(c) * 3) % 80 for c in str(text)][:10]
        return {"input_ids": np.asarray([ids]),
                "attention_mask": np.ones((1, len(ids)), np.int64)}


class _Proc:
    tokenizer = _Tok()

    def __call__(self, text=None, **kw):
        return self.tokenizer(text[0] if isinstance(text, list) else text)


def _model():
    cfg = {"model_type": "nemotron_labs_diffusion", "vocab_size": 120,
           "hidden_size": 32, "intermediate_size": 64,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
           "mask_token_id": 119, "tie_word_embeddings": False,
           "rope_parameters": {"rope_theta": 1e6,
                               "llama_4_scaling_beta": 0.1,
                               "original_max_position_embeddings": 8192},
           "layer_types": ["full_attention", "full_attention"]}
    rand = _rng_rand(np.random.default_rng(0))
    w = _llama_like_weights(cfg, rand)
    return load_model_from_weights(cfg, w, jnp.float32)


def test_detection_and_canvas_generate():
    m = _model()
    assert is_diffusion_model(m)
    out = list(stream_diffusion_generate(
        m, _Proc(), "hello", max_tokens=8, block_size=4,
        mask_token_id=119))
    assert len(out) == 8


def test_bidirectionality():
    m = _model()
    ids = np.array([[5, 6, 7, 8, 9, 10]], np.int32)
    ids2 = ids.copy()
    ids2[0, -1] = 42
    l1 = np.asarray(m.forward_full(m.params, jnp.asarray(ids)))
    l2 = np.asarray(m.forward_full(m.params, jnp.asarray(ids2)))
    assert np.abs(l1[0, 0] - l2[0, 0]).max() > 1e-6
    c1 = np.asarray(m.forward_full(m.params, jnp.asarray(ids), causal=True))
    c2 = np.asarray(m.forward_full(m.params, jnp.asarray(ids2),
                                   causal=True))
    assert np.abs(c1[0, 0] - c2[0, 0]).max() < 1e-7
