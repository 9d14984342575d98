"""LLaDA-style masked-diffusion language model (bidirectional llama arch).

Role parity: reference diffusion families (llada2_moe, diffusion_gemma,
nemotron_labs_diffusion) driven by mlx_vlm/generate/diffusion.py.  The model
is a llama-architecture transformer with bidirectional attention and a
[MASK] token; generation is iterative demasking (generate/diffusion.py here).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel
from ..llama.llama import Model as _LlamaModel, text_position_ids

STACK_PATTERNS = ("language_model.model.layers",)


@dataclass
class ModelConfig(_LlamaText):
    model_type: str = "llada"
    mask_token_id: int = 126336
    diffusion: bool = True


class Model(_LlamaModel):
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def forward_full(self, params, input_ids, causal: bool = False):
        """Bidirectional full-canvas forward -> logits [B, S, V] (traceable)."""
        import jax.numpy as jnp

        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        B, S = input_ids.shape
        pos = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None, None], (3, B, S)
        )
        hidden, _ = self.language_model(lm, embeds, None, pos, causal=causal)
        return self.language_model.logits(lm, hidden)
