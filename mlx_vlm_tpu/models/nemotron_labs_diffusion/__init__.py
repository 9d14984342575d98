"""Nemotron-Labs diffusion language model.

Role parity: reference mlx_vlm/models/nemotron_labs_diffusion — a
llama-shaped decoder with the llama-4-style position-dependent query
temperature (rope_parameters.llama_4_scaling_beta,
language.py:_llama4_attention_scale:154) that decodes EITHER
autoregressively (default_generation_mode "ar") or as a bidirectional
diffusion canvas with mask_token_id demasking (dlm_paradigm
"bidirectional"; the shared generator supplies the confidence-threshold
and entropy-bound samplers, generate/diffusion.py).

TPU design: rides the ministral3 decoder (same attention-temperature
and mixed sliding/full machinery) with its canvas_bidirectional hook;
forward_full is the llada diffusion contract.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import Optional, Union

import jax.numpy as jnp

from ..ministral3.ministral3 import LanguageModel as _M3LM
from ..ministral3.ministral3 import Model as _M3Model
from ..ministral3.ministral3 import TextConfig as _M3Text


@dataclass
class TextConfig(_M3Text):
    model_type: str = "nemotron_labs_diffusion"
    mask_token_id: int = 100
    diffusion: bool = True
    default_generation_mode: str = "ar"
    dlm_paradigm: str = "bidirectional"
    canvas_length: int = 256
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = False

    def __post_init__(self):
        super().__post_init__()
        if self.rope_parameters is None or "rope_theta" \
                not in self.rope_parameters:
            rp = dict(self.rope_parameters or {})
            rp.setdefault("rope_theta", self.rope_theta)
            self.rope_parameters = rp


ModelConfig = TextConfig


class LanguageModel(_M3LM):
    pass


class Model(_M3Model):
    CONFIG_CLS = TextConfig

    def __init__(self, config: TextConfig):
        super().__init__(config)
        self.language_model = LanguageModel(config)

    def forward_full(self, params, input_ids, causal: bool = False):
        """Bidirectional full-canvas forward -> logits [B, S, V]
        (diffusion generator contract, models/llada/llada.py:34)."""
        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        B, S = input_ids.shape
        self.language_model.canvas_bidirectional = not causal
        try:
            pos = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[None, None], (3, B, S))
            hidden, _ = self.language_model(lm, embeds, None, pos)
        finally:
            self.language_model.canvas_bidirectional = False
        return self.language_model.logits(lm, hidden)


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel"]
