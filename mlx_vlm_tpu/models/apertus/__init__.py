"""Apertus (Swiss AI) — qk-normed llama attention + learned xIELU MLP.

Role parity: reference mlx_vlm/models/apertus/language.py —
ApertusAttention with per-head q/k RMSNorm (:32), single-input up/down
MLP through the trainable xIELU activation (activations.py:12:
softplus-parameterised alpha_p/alpha_n with beta=0.5), block norms named
attention_layernorm / feedforward_layernorm.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import Model as _LlamaModel
from ...core.layers import linear


def xielu(x, alpha_p, alpha_n, beta=0.5, eps=-1e-6):
    """Trainable piecewise activation (reference activations.py:12)."""
    xf = x.astype(jnp.float32)
    ap = jax.nn.softplus(alpha_p.astype(jnp.float32))
    an = beta + jax.nn.softplus(alpha_n.astype(jnp.float32))
    pos = ap * jnp.square(xf) + beta * xf
    neg = (jnp.expm1(jnp.minimum(xf, eps)) - xf) * an + beta * xf
    return jnp.where(xf > 0, pos, neg).astype(x.dtype)


@dataclass
class ModelConfig(_LlamaText):
    model_type: str = "apertus"


TextConfig = ModelConfig


class LanguageModel(_LlamaLM):
    def _mlp(self, p, x):
        h = xielu(linear(p["up_proj"], x),
                  p["act_fn"]["alpha_p"], p["act_fn"]["alpha_n"])
        return linear(p["down_proj"], h)


class Model(_LlamaModel):
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if k.endswith(("alpha_p", "alpha_n")):
                v = v.reshape(())
            k = k.replace(".attention_layernorm.", ".input_layernorm.")
            k = k.replace(".feedforward_layernorm.",
                          ".post_attention_layernorm.")
            out[k] = v
        return _LlamaModel.sanitize(out)
