"""MiniMax M3 VL top-level model.

Role parity: reference mlx_vlm/models/minimax_m3_vl/minimax_m3_vl.py —
MiniMaxProjector (:106), patch_merge_mlp (:155), _merge_visual_tokens
(:217), _sanitize_moe_weights (:37), get_input_embeddings (:239).

TPU design: patch order is merge-window-major, so the per-image spatial
merge collapses to one global reshape into groups of merge_size^2
consecutive tokens; the feature merge reuses the shared vectorized masked
gather.  Language positions are 1-D (no M-RoPE).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import LanguageModel
from .vision import VisionModel, minimax_vision_rotary_and_segments

STACK_PATTERNS = (
    "language_model.model.dense_pre",
    "language_model.model.main_layers",
    "vision_tower.vision_model.encoder.layers",
)


def _projector(p, x, act: str):
    x = linear(p["linear_1"], x)
    if act == "silu":
        x = jax.nn.silu(x)
    elif act == "quick_gelu":
        x = x * jax.nn.sigmoid(1.702 * x)
    else:
        x = jax.nn.gelu(x, approximate=False)
    return linear(p["linear_2"], x)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        if not isinstance(config.vision_feature_layer, int):
            raise ValueError(
                "minimax_m3_vl: list vision_feature_layer not supported yet"
            )

    # ------------------------------------------------------------------ jit
    def vision_features(
        self,
        params: dict,
        pixel_values: jax.Array,
        rotary_freqs: jax.Array,
        segment_ids: jax.Array,
    ) -> jax.Array:
        cfg = self.config
        feats = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            feature_layer=cfg.vision_feature_layer,
        )
        if cfg.vision_feature_select_strategy == "default":
            feats = feats[1:]
        feats = _projector(
            params["multi_modal_projector"], feats, cfg.projector_hidden_act
        )
        m2 = cfg.vision_config.spatial_merge_size**2
        feats = feats.reshape(-1, m2 * feats.shape[-1])
        return _projector(
            params["patch_merge_mlp"], feats, cfg.projector_hidden_act
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids
            )
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id or -1,
            self.config.video_token_id or -1,
            feats,
            embeds,
            input_ids,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm_params = params["language_model"]
        hidden, cache = self.language_model(
            lm_params, inputs_embeds, cache, position_ids
        )
        return self.language_model.logits(lm_params, hidden), cache

    # ----------------------------------------------------------------- host
    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        vc = self.config.vision_config
        freqs, segs = minimax_vision_rotary_and_segments(
            grid_thw,
            vc.spatial_merge_size,
            self.vision_tower.head_dim,
            vc.rope_theta,
            vc.vision_segment_max_frames,
        )
        return {"rotary_freqs": freqs, "segment_ids": segs}

    def sanitize(self, weights: dict) -> dict:
        cfg = self.config.text_config

        def transform(key: str) -> str:
            for old, new in (
                ("model.language_model.", "language_model."),
                ("model.vision_tower.", "vision_tower."),
                ("model.multi_modal_projector.", "multi_modal_projector."),
                ("model.patch_merge_mlp.", "patch_merge_mlp."),
            ):
                if key.startswith(old):
                    return new + key[len(old):]
            if key == "lm_head.weight" or key.startswith("lm_head."):
                return "language_model." + key
            if key.startswith("model."):
                return "language_model." + key
            return key

        weights = {transform(k): v for k, v in weights.items()}

        E = cfg.num_local_experts
        flags = [cfg.is_moe_layer(i) for i in range(cfg.num_hidden_layers)]
        n_pre = flags.index(True) if True in flags else len(flags)

        def group_key(idx: int, rest: str) -> str:
            if idx < n_pre:
                return f"language_model.model.dense_pre.{idx}.{rest}"
            return f"language_model.model.main_layers.{idx - n_pre}.{rest}"

        out = {}
        stacks: dict = {}
        layer_re = re.compile(r"^language_model\.model\.layers\.(\d+)\.(.+)$")
        # HF expert naming: block_sparse_moe.experts.{e}.w1/w2/w3
        exp_re = re.compile(
            r"^block_sparse_moe\.experts\.(\d+)\.(w1|w2|w3)\.(.+)$"
        )
        name_map = {"w1": "gate_proj", "w2": "down_proj", "w3": "up_proj"}

        for k, v in weights.items():
            m = layer_re.match(k)
            if not m:
                out[k] = v
                continue
            idx, rest = int(m.group(1)), m.group(2)
            em = exp_re.match(rest)
            if em:
                e, wn, tail = int(em.group(1)), em.group(2), em.group(3)
                dest = group_key(
                    idx, f"block_sparse_moe.experts.{name_map[wn]}.{tail}"
                )
                stacks.setdefault(dest, {})[e] = v
                continue
            # mlx packed switch layout -> unpack (routed E + shared 1)
            pm = re.match(
                r"^block_sparse_moe\.switch_mlp\.(gate_up_proj|down_proj)\.(.+)$",
                rest,
            )
            if pm:
                name, tail = pm.group(1), pm.group(2)
                v = np.asarray(v)
                routed, shared = v[:E], v[E]
                base = group_key(idx, "block_sparse_moe.")
                if name == "down_proj":
                    out[base + f"experts.down_proj.{tail}"] = routed
                    out[base + f"shared_experts.down_proj.{tail}"] = shared
                else:
                    half = routed.shape[1] // 2
                    out[base + f"experts.gate_proj.{tail}"] = routed[:, :half]
                    out[base + f"experts.up_proj.{tail}"] = routed[:, half:]
                    out[base + f"shared_experts.gate_proj.{tail}"] = (
                        shared[:half]
                    )
                    out[base + f"shared_experts.up_proj.{tail}"] = shared[half:]
                continue
            out[group_key(idx, rest)] = v

        for dest, items in stacks.items():
            vals = [items[i] for i in sorted(items)]
            if len(vals) != max(items) + 1:
                raise ValueError(f"missing expert indices for {dest}")
            out[dest] = np.stack([np.asarray(t) for t in vals])

        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = VisionModel.sanitize(vt)
        out = {k: v for k, v in out.items() if not k.startswith("vision_tower.")}
        out.update(vt)
        if cfg.tie_word_embeddings:
            out.pop("language_model.lm_head.weight", None)
        return out

    @property
    def stack_patterns(self):
        return STACK_PATTERNS

    @property
    def decoder_layers(self) -> int:
        return self.config.text_config.num_hidden_layers
