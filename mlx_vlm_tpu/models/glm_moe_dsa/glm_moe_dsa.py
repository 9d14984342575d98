"""GLM-MoE-DSA: deepseek_v32 sparse attention with per-layer indexer reuse.

Role parity: reference mlx_vlm/models/glm_moe_dsa/ — the decoder is the
DeepSeek-V3.2 MLA+DSA stack, but only layers marked "full" in
`indexer_types` run their own lightning indexer; "shared" layers reuse the
previous full layer's top-k selection (language.py:21-135, config.py:51
derives the pattern from index_topk_freq/offset or an F/S string).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from ...core.layers import rms_norm
from ...core.mask import causal_cache_mask
from ..deepseek_v32.deepseek_v32 import DSACache
from ..deepseek_v32.deepseek_v32 import LanguageModel as _V32LM
from ..deepseek_v32.deepseek_v32 import Model as _V32Model
from ..deepseek_v32.deepseek_v32 import ModelConfig as _V32Config
from ..deepseek_v2.deepseek_v2 import LanguageModel as _V2LM


@dataclass
class ModelConfig(_V32Config):
    model_type: str = "glm_moe_dsa"
    rope_parameters: Optional[Dict] = None
    indexer_types: Optional[List[str]] = None
    index_topk_pattern: Optional[Any] = None
    index_topk_freq: int = 1
    index_skip_topk_offset: int = 2

    def __post_init__(self):
        if hasattr(super(), "__post_init__"):
            super().__post_init__()
        if self.rope_parameters:
            self.rope_scaling = self.rope_parameters
            self.rope_theta = self.rope_parameters.get(
                "rope_theta", self.rope_theta)
        if self.indexer_types is None:
            if self.index_topk_pattern is not None:
                pattern = self.index_topk_pattern
                if isinstance(pattern, str):
                    self.indexer_types = [
                        {"F": "full", "S": "shared"}[c] for c in pattern]
                else:
                    self.indexer_types = list(pattern)
            else:
                freq = max(self.index_topk_freq, 1)
                off = self.index_skip_topk_offset
                self.indexer_types = [
                    "full" if (max(i - off + 1, 0) % freq) == 0 else "shared"
                    for i in range(self.num_hidden_layers)]


class LanguageModel(_V32LM):
    def __call__(self, params, inputs_embeds, cache: DSACache,
                 position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos, sin = self.rope.cos_sin(position_ids)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        h = inputs_embeds
        mp = params["model"]
        c_all, kpe_all, ik_all = cache.c, cache.kpe, cache.ik
        sparse_mask = mask  # "shared" layers before any "full" fall back
        for i in range(a.num_hidden_layers):
            lp = mp["layers"][str(i)]
            x = rms_norm(lp["input_layernorm"], h, a.rms_norm_eps)
            if a.indexer_types[i] == "full":
                sparse_mask, ik_buf = self._index_mask(
                    lp["self_attn"], x, cos, sin, mask, cache, i)
                ik_all = ik_all.at[i].set(ik_buf)
            attn, c_buf, kpe_buf = _V2LM._mla(
                self, lp, x, cos, sin, sparse_mask, cache, i)
            c_all = c_all.at[i].set(c_buf)
            kpe_all = kpe_all.at[i].set(kpe_buf)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, a.rms_norm_eps)
            h = h + self._moe_or_dense(lp, x)
        h = rms_norm(mp["norm"], h, a.rms_norm_eps)
        new_cache = dataclasses.replace(
            cache, c=c_all, kpe=kpe_all, ik=ik_all, offset=cache.offset + S)
        return h, new_cache


class Model(_V32Model):
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config, config)
