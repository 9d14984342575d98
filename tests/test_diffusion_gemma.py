"""diffusion_gemma: gemma4-class decoder decoding a diffusion canvas."""

import numpy as np

import jax.numpy as jnp

from mlx_vlm_tpu.generate.diffusion import (is_diffusion_model,
                                            stream_diffusion_generate)
from mlx_vlm_tpu.utils.loader import load_model_from_weights

from test_gemma4_text import tiny_gemma4_config, tiny_gemma4_weights


class _Tok:
    eos_token_id = 254

    def decode(self, ids, **kw):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def __call__(self, text, **kw):
        ids = [(ord(c) * 3) % 200 for c in str(text)][:12]
        return {"input_ids": np.asarray([ids]),
                "attention_mask": np.ones((1, len(ids)), np.int64)}


class _Proc:
    tokenizer = _Tok()

    def __call__(self, text=None, **kw):
        return self.tokenizer(text[0] if isinstance(text, list) else text)


def _model():
    cfg = tiny_gemma4_config()
    cfg["model_type"] = "diffusion_gemma"
    cfg["mask_token_id"] = cfg["vocab_size"] - 1
    w = tiny_gemma4_weights(cfg, seed=0)
    return load_model_from_weights(cfg, w, jnp.float32)


def test_detection_and_canvas_generate():
    m = _model()
    assert is_diffusion_model(m)
    out = list(stream_diffusion_generate(
        m, _Proc(), "hello there", max_tokens=8, block_size=4,
        mask_token_id=m.config.mask_token_id))
    assert len(out) == 8
    assert out[-1].finish_reason == "length"


def test_bidirectional_canvas_differs_from_causal():
    """forward_full must actually be bidirectional: a future token has to
    influence an earlier position's logits."""
    m = _model()
    ids = np.array([[5, 6, 7, 8, 9, 10]], np.int32)
    ids2 = ids.copy()
    ids2[0, -1] = 42  # change only the LAST token
    l1 = np.asarray(m.forward_full(m.params, jnp.asarray(ids)))
    l2 = np.asarray(m.forward_full(m.params, jnp.asarray(ids2)))
    # position 0's logits change -> information flowed backwards
    assert np.abs(l1[0, 0] - l2[0, 0]).max() > 1e-6
    # causal mode: position 0 must be unaffected
    c1 = np.asarray(m.forward_full(m.params, jnp.asarray(ids), causal=True))
    c2 = np.asarray(m.forward_full(m.params, jnp.asarray(ids2), causal=True))
    assert np.abs(c1[0, 0] - c2[0, 0]).max() < 1e-7
