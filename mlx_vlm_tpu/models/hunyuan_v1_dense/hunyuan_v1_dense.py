"""Hunyuan v1 (dense) text model: llama decoder + NTK-alpha rope + post-rope
q/k norms.

Role parity: reference mlx_vlm/models/hunyuan_v1_dense/language.py —
DynamicNTKAlphaRoPE (base * alpha^(d/(d-2))):16-37, q/k RMSNorm applied
AFTER rope:100-102.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ...core.layers import linear, rms_norm
from ...core.rope import apply_rope, make_rope
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "hunyuan_v1_dense"
    use_qk_norm: bool = True


ModelConfig = TextConfig


class LanguageModel(_LlamaLM):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        alpha = 1.0
        if args.rope_scaling and "alpha" in args.rope_scaling:
            alpha = args.rope_scaling["alpha"]
        d = self.head_dim
        base = args.rope_theta * alpha ** (d / (d - 2))
        self.rope = make_rope(d, base, None,
                              args.max_position_embeddings or 131072)

    def _project_qkv(self, p, x):
        # plain projections; norms come after rope (see _attention*)
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3))

    def _post_rope_norm(self, p, q, k):
        if self.args.use_qk_norm and "query_layernorm" in p:
            eps = self.args.rms_norm_eps
            q = rms_norm(p["query_layernorm"], q, eps)
            k = rms_norm(p["key_layernorm"], k, eps)
        return q, k

    def _attention(self, p, x, cos, sin, mask, cache, cxs):
        B, S, _ = x.shape
        q, k, v = self._project_qkv(p, x)
        q, k = apply_rope(q, k, cos, sin)
        q, k = self._post_rope_norm(p, q, k)
        out, cxs = cache.attend(cxs, q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out), cxs

    def _attention_nc(self, p, x, cos, sin, mask):
        from ...ops.attention import sdpa

        B, S, _ = x.shape
        q, k, v = self._project_qkv(p, x)
        q, k = apply_rope(q, k, cos, sin)
        q, k = self._post_rope_norm(p, q, k)
        out = sdpa(q, k, v, self.scale, mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, -1)
        return linear(p["o_proj"], out)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
