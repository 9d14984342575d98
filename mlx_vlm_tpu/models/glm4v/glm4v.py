"""GLM-4V: ViT with bicubic-sampled pos-embeds + conv downsample merger,
GLM decoder with extra sandwich norms and partial-rotary chunked M-RoPE.

Role parity: reference mlx_vlm/models/glm4v — Glm4vVisionEmbeddings (per
patch grid_sample bicubic):vision.py:70, downsample Conv2d(k=s=merge):
vision.py:283, Glm4vVisionPatchMerger (proj+LN+gelu+SwiGLU):vision.py:171,
Glm4vDecoderLayer (post_self_attn/post_mlp norms):language.py:180,
sectioned_even_odd partial mrope:language.py:90.

TPU design: the grid_sample is the same host-side 16-tap bicubic plan used
by kimi_vl; the downsample conv is a matmul over merge-block windows (the
tower's token order is already merge-block); the decoder runs under one
lax.scan with traditional-pair rotation on the rotary sub-dim.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.layers import (embedding, embedding_as_linear, layer_norm,
                            linear, rms_norm)
from ...core.mask import causal_cache_mask
from ...core.rope import (apply_rope, apply_rope_traditional,
                          default_inv_freq, mrope_cos_sin, mrope_section_map)
from ...ops.attention import sdpa
from ..kimi_vl.kimi_vl import _axis_taps
from ..llama.llama import text_position_ids
from ..qwen2_vl.language import mrope_position_ids
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen2_vl.vision import vision_rotary_and_segments
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.blocks",
)


def glm_pos_plan(grids: List[Tuple[int, int]], src_side: int,
                 merge: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side 16-tap bicubic plan for the learnable pos-emb grid, sampled
    at per-patch coords in merge-block order (reference vision.py:82-137)."""
    idx_all, w_all = [], []
    for h, w in grids:
        ty, wy = _axis_taps(src_side, h)  # [h, 4]
        tx, wx = _axis_taps(src_side, w)  # [w, 4]
        # expand to the merge-block patch order
        order = np.arange(h * w).reshape(
            h // merge, merge, w // merge, merge
        ).transpose(0, 2, 1, 3).reshape(-1)
        ys, xs = order // w, order % w
        idx = (ty[ys][:, :, None] * src_side + tx[xs][:, None, :]).reshape(
            h * w, 16).T
        wgt = (wy[ys][:, :, None] * wx[xs][:, None, :]).reshape(h * w, 16).T
        idx_all.append(idx)
        w_all.append(wgt)
    return (
        np.concatenate(idx_all, axis=1).astype(np.int32),
        np.concatenate(w_all, axis=1).astype(np.float32),
    )


class VisionModel:
    def __init__(self, config: VisionConfig):
        self.config = config
        self.num_heads = config.num_heads
        self.head_dim = config.hidden_size // config.num_heads
        self.scale = self.head_dim**-0.5
        self.mu = config.spatial_merge_size**2
        self.src_side = config.image_size // config.patch_size

    def __call__(self, params, pixel_values, rotary_freqs, segment_ids,
                 pos_idx, pos_weights):
        cfg = self.config
        w = params["patch_embed"]["proj"]["weight"]  # [E, C*T*P*P]
        h = jnp.dot(pixel_values.astype(w.dtype), w.T)
        if "bias" in params["patch_embed"]["proj"]:
            h = h + params["patch_embed"]["proj"]["bias"]
        h = rms_norm(params["post_conv_layernorm"], h, cfg.rms_norm_eps)
        table = params["embeddings"]["position_embedding"]["weight"]
        pos = jnp.einsum(
            "kn,knd->nd", pos_weights.astype(jnp.float32),
            jnp.take(table, pos_idx, axis=0).astype(jnp.float32),
        )
        h = h + pos.astype(h.dtype)

        cos = jnp.cos(rotary_freqs)[None]
        sin = jnp.sin(rotary_freqs)[None]
        mask = (segment_ids[None, :] == segment_ids[:, None])[None, None]

        def block(h, lp):
            x = rms_norm(lp["norm1"], h, 1e-6)
            x = self._attention(lp["attn"], x, cos, sin, mask)
            h = h + x
            x = rms_norm(lp["norm2"], h, 1e-6)
            g = linear(lp["mlp"]["gate_proj"], x)
            u = linear(lp["mlp"]["up_proj"], x)
            h = h + linear(lp["mlp"]["down_proj"], jax.nn.silu(g) * u)
            return h, None

        h, _ = jax.lax.scan(block, h, params["blocks"])
        h = rms_norm(params["post_layernorm"], h, cfg.rms_norm_eps)
        # downsample conv (k = s = merge) over merge-block windows
        E = cfg.hidden_size
        win = h.reshape(-1, self.mu * E)  # (ky, kx, E) flat per block
        dw = params["downsample"]["weight"]  # [out, mu*E] (sanitized)
        x = jnp.dot(win.astype(dw.dtype), dw.T)
        if "bias" in params["downsample"]:
            x = x + params["downsample"]["bias"]
        # merger: proj -> LN -> gelu -> SwiGLU (reference vision.py:171)
        mp = params["merger"]
        x = linear(mp["proj"], x)
        x = jax.nn.gelu(
            layer_norm(mp["post_projection_norm"], x, 1e-5), approximate=False
        )
        g = linear(mp["gate_proj"], x)
        u = linear(mp["up_proj"], x)
        return linear(mp["down_proj"], jax.nn.silu(g) * u)

    def _attention(self, p, x, cos, sin, mask):
        N = x.shape[0]
        qkv = linear(p["qkv"], x).reshape(N, 3, self.num_heads, self.head_dim)
        q = qkv[:, 0].transpose(1, 0, 2)[None]
        k = qkv[:, 1].transpose(1, 0, 2)[None]
        v = qkv[:, 2].transpose(1, 0, 2)[None]
        q, k = apply_rope(q, k, cos, sin)
        out = sdpa(q, k, v, self.scale, mask)
        out = out[0].transpose(1, 0, 2).reshape(N, -1)
        return linear(p["proj"], out)

    def aux_inputs(self, grid_thw: np.ndarray) -> dict:
        cfg = self.config
        freqs, segs = vision_rotary_and_segments(
            grid_thw, cfg.spatial_merge_size, self.head_dim
        )
        grids = [(int(r[-2]), int(r[-1])) for r in np.asarray(grid_thw)]
        idx, wgt = glm_pos_plan(grids, self.src_side, cfg.spatial_merge_size)
        # tile over frames
        reps = [int(r[0]) for r in np.asarray(grid_thw)]
        if any(t > 1 for t in reps):
            parts_i, parts_w, off = [], [], 0
            for (hh, ww), t in zip(grids, reps):
                n = hh * ww
                parts_i.append(np.tile(idx[:, off:off + n], (1, t)))
                parts_w.append(np.tile(wgt[:, off:off + n], (1, t)))
                off += n
            idx = np.concatenate(parts_i, axis=1)
            wgt = np.concatenate(parts_w, axis=1)
        return {"rotary_freqs": freqs, "segment_ids": segs,
                "pos_idx": idx, "pos_weights": wgt}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "position_ids" in k:
                continue
            if "patch_embed.proj.weight" in k and v.ndim == 5:
                v = v.reshape(v.shape[0], -1)
            if "downsample.weight" in k and v.ndim == 4:
                # [out, E, m, m] -> [out, m*m*E] matching (ky, kx, E) windows
                v = v.transpose(0, 2, 3, 1).reshape(v.shape[0], -1)
            out[k] = v
        return out


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rot_dim = int(args.head_dim * args.partial_rotary_factor)
        self.inv_freq = jnp.asarray(
            default_inv_freq(self.rot_dim, args.rope_theta), jnp.float32
        )
        sections = tuple(args.rope_scaling["mrope_section"])
        self.section_map = jnp.asarray(mrope_section_map(sections, "chunked"))
        # glm_ocr rides this decoder without the sandwich norms
        self.sandwich = True

    def __call__(self, params, inputs_embeds, cache, position_ids):
        args = self.args
        B, S, _ = inputs_embeds.shape
        eps = args.rms_norm_eps
        if position_ids.ndim == 2:
            position_ids = jnp.broadcast_to(position_ids[None], (3, B, S))
        cos, sin = mrope_cos_sin(position_ids, self.inv_freq, self.section_map)
        h = inputs_embeds
        mp = params["model"]
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S, cache.capacity)

        def layer(h, xs):
            lp, cxs = xs
            x = rms_norm(lp["input_layernorm"], h, eps)
            q, k, v = self._qkv(lp["self_attn"], x)
            rd = self.rot_dim
            q_r, k_r = apply_rope_traditional(q[..., :rd], k[..., :rd], cos, sin)
            q = jnp.concatenate([q_r, q[..., rd:]], axis=-1)
            k = jnp.concatenate([k_r, k[..., rd:]], axis=-1)
            attn, cxs = cache.attend(cxs, q, k, v, self.scale, mask,
                                     flash_ok=False)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            attn = linear(lp["self_attn"]["o_proj"], attn)
            if self.sandwich:
                attn = rms_norm(lp["post_self_attn_layernorm"], attn, eps)
            h = h + attn
            x = rms_norm(lp["post_attention_layernorm"], h, eps)
            gu = linear(lp["mlp"]["gate_up_proj"], x)
            g, u = jnp.split(gu, 2, axis=-1)
            r = linear(lp["mlp"]["down_proj"], jax.nn.silu(g) * u)
            if self.sandwich:
                r = rms_norm(lp["post_mlp_layernorm"], r, eps)
            h = h + r
            return h, cxs

        h, cys = jax.lax.scan(layer, h, (mp["layers"], cache.scan_arrays()))
        h = rms_norm(mp["norm"], h, eps)
        return h, (None if made else cache.with_arrays(cys, S))

    def _qkv(self, p, x):
        B, S, _ = x.shape
        q = linear(p["q_proj"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = linear(p["k_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = linear(p["v_proj"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        return q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"], hidden)
        return linear(params["lm_head"], hidden)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16, left_pad=None):
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_kv_heads,
            self.head_dim, capacity, dtype, left_pad,
        )

    def get_rope_index(self, input_ids, image_grid_thw=None,
                       video_grid_thw=None, attention_mask=None):
        cfg = self.config
        return mrope_position_ids(
            input_ids, image_grid_thw, video_grid_thw, attention_mask,
            merge=cfg.vision_config.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
        )


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids,
                        pos_idx, pos_weights):
        return self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            pos_idx, pos_weights,
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs=None, segment_ids=None, pos_idx=None, pos_weights=None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids,
                pos_idx, pos_weights,
            )
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.video_token_id,
            feats, embeds, input_ids,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return self.language_model.get_rope_index(
            input_ids, image_grid_thw, video_grid_thw, attention_mask
        )

    def vision_aux_inputs(self, grid_thw):
        return self.vision_tower.aux_inputs(grid_thw)

    @staticmethod
    def sanitize(weights: dict) -> dict:
        def transform(key: str) -> str:
            if "visual" in key and "vision_tower" not in key:
                key = key.replace("model.", "").replace("visual", "vision_tower")
            if key.startswith("model.language_model"):
                key = key.replace("model.language_model", "language_model.model")
            elif key.startswith("model.") and not key.startswith("model.lang"):
                key = "language_model." + key
            if "lm_head" in key and not key.startswith("language_model"):
                key = "language_model." + key
            return key

        weights = {transform(k): v for k, v in weights.items()}
        vt = {k: v for k, v in weights.items() if k.startswith("vision_tower.")}
        vt = VisionModel.sanitize(vt)
        weights = {k: v for k, v in weights.items()
                   if not k.startswith("vision_tower.")}
        weights.update(vt)
        return weights

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
