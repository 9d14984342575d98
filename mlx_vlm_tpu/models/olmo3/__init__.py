"""OLMo-3: olmo2 post-norm decoder + sliding/full layer pattern.

Role parity: reference mlx_vlm/models/olmo3/language.py — flat q/k
RMSNorms and post-branch norms like olmo2, but every 4th layer is
"full_attention" with scaled (yarn) rope while the rest use a sliding
window with PLAIN rope (:56-64, config.py:29).

TPU design: one scan over stacked layers with a per-layer boolean flag
selecting between two precomputed (mask, cos/sin) pairs — the gpt_oss
pattern.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear, rms_norm, swiglu_mlp
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, make_rope
from ..olmo2.olmo2 import LanguageModel as _Olmo2LM
from ..olmo2.olmo2 import Model as _Olmo2Model
from ..olmo2.olmo2 import TextConfig as _Olmo2Text


@dataclass
class ModelConfig(_Olmo2Text):
    model_type: str = "olmo3"
    sliding_window: int = 4096
    layer_types: Optional[List[str]] = None

    def __post_init__(self):
        if hasattr(super(), "__post_init__"):
            super().__post_init__()
        if self.layer_types is None:
            self.layer_types = [
                "full_attention" if (i + 1) % 4 == 0 else
                "sliding_attention"
                for i in range(self.num_hidden_layers)]


TextConfig = ModelConfig


class LanguageModel(_Olmo2LM):
    def __init__(self, args: ModelConfig, config=None):
        super().__init__(args, config)
        # full layers: scaled rope; sliding layers: plain rope
        self.rope_plain = make_rope(self.head_dim, args.rope_theta, None,
                                    args.max_position_embeddings or 131072)
        self.is_full = np.asarray(
            [t == "full_attention" for t in args.layer_types])

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        eps = args.rms_norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos_f, sin_f = self.rope.cos_sin(position_ids)
        cos_s, sin_s = self.rope_plain.cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_f = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_s = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity,
                                   window=args.sliding_window)
        flags = jnp.asarray(self.is_full)

        def layer(h, xs):
            lp, cxs, full = xs
            mask = jnp.where(full, mask_f, mask_s)
            cos = jnp.where(full, cos_f, cos_s)
            sin = jnp.where(full, sin_f, sin_s)
            sa = lp["self_attn"]
            q = rms_norm(sa["q_norm"], linear(sa["q_proj"], h), eps)
            k = rms_norm(sa["k_norm"], linear(sa["k_proj"], h), eps)
            v = linear(sa["v_proj"], h)
            q = q.reshape(B, S, self.n_heads, self.head_dim).transpose(
                0, 2, 1, 3)
            k = k.reshape(B, S, self.n_kv_heads, self.head_dim).transpose(
                0, 2, 1, 3)
            v = v.reshape(B, S, self.n_kv_heads, self.head_dim).transpose(
                0, 2, 1, 3)
            q, k = apply_rope(q, k, cos, sin)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask,
                                     flash_ok=False)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(sa["o_proj"], attn)
            h = h + rms_norm(lp["post_attention_layernorm"], attn, eps)
            r = swiglu_mlp(lp["mlp"], h)
            h = h + rms_norm(lp["post_feedforward_layernorm"], r, eps)
            return h, cxs

        h, cys = jax.lax.scan(layer, h,
                              (mp["layers"], cache.scan_arrays(), flags))
        h = rms_norm(mp["norm"], h, eps)
        return h, (None if made else cache.with_arrays(cys, S))


class Model(_Olmo2Model):
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)
