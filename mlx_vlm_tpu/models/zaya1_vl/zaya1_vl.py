"""Zaya1-VL top-level model: qwen2_5_vl vision tower + Zaya CCA/MoE decoder.

Role parity: reference mlx_vlm/models/zaya1_vl/zaya1_vl.py (Model:13,
merge_input_ids_with_image_features:60, sanitize:129) and the expert /
conv weight sanitize in language.py:696-734.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen2_5_vl.vision import VisionModel, window_partition_aux
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import LanguageModel

STACK_PATTERNS = ("language_model.model.layers", "vision_tower.blocks")


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs: Optional[jax.Array] = None,
        seg_full: Optional[jax.Array] = None,
        seg_win: Optional[jax.Array] = None,
        patch_perm: Optional[jax.Array] = None,
        reverse_index: Optional[jax.Array] = None,
        window_index: Optional[jax.Array] = None,  # metadata; unused on device
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None:
            return embeds
        feats = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs,
            seg_full, seg_win, patch_perm, reverse_index,
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id, self.config.image_token_id,
            feats, embeds, input_ids,
        )

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm_params = params["language_model"]
        hidden, cache = self.language_model(
            lm_params, inputs_embeds, cache, position_ids
        )
        return self.language_model.logits(lm_params, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        ids = np.asarray(input_ids)
        B, S = ids.shape
        # vision-LoRA gate plane, consumed (as data) by init_cache
        self.language_model.pending_image_mask = (
            ids == self.config.image_token_id
        )
        pos = np.broadcast_to(np.arange(S, dtype=np.int32), (B, S))
        return (
            np.broadcast_to(pos[None], (3, B, S)),
            np.zeros((B, 1), np.int32),
        )

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        return window_partition_aux(grid_thw, self.config.vision_config)

    def sanitize(self, weights: dict) -> dict:
        a = self.config.text_config
        out = {}
        expert_groups: dict = {}
        for k, v in weights.items():
            if k == "lm_head.weight" and a.tie_word_embeddings:
                continue
            if k.startswith("model."):
                k = "language_model." + k
            elif k.startswith("lm_head."):
                k = "language_model." + k
            if ".local_experts." in k:
                # stack per-expert fc weights (reference language.py:699-726)
                pre, rest = k.split(".local_experts.", 1)
                idx, name = rest.split(".", 1)
                expert_groups.setdefault((pre, name), {})[int(idx)] = v
                continue
            if ".conv_qk." in k and k.endswith("weight") and v.ndim == 3:
                v = self._conv_layout(k, v)
            out[k] = v
        for (pre, name), items in expert_groups.items():
            vals = [items[i] for i in sorted(items)]
            out[f"{pre}.{name}"] = np.stack(
                [np.asarray(x) for x in vals], axis=0
            )

        vt = {k: v for k, v in out.items() if k.startswith("vision_tower.")}
        vt = VisionModel.sanitize(vt)
        out = {k: v for k, v in out.items()
               if not k.startswith("vision_tower.")}
        out.update(vt)

        # homogenize layer 0 for the scan stack (see language.py docstring)
        D = a.hidden_size
        l0 = "language_model.model.layers.0."
        if a.scale_residual_merge:
            out.setdefault(l0 + "attn.res_scale.residual_scale",
                           np.ones(D, np.float32))
            out.setdefault(l0 + "attn.res_scale.residual_bias",
                           np.zeros(D, np.float32))
        if a.zaya_use_eda:
            out.setdefault(
                l0 + "mlp.zaya_block.router.router_states_scale",
                np.zeros(a.zaya_mlp_expansion, np.float32),
            )
        # balancing_biases may be a non-persistent buffer in checkpoints
        nE = a.num_experts + (1 if a.zaya_use_mod else 0)
        bb = np.zeros(nE, np.float32)
        if a.zaya_use_mod:
            bb[-1] = -1.0
        for i in range(a.num_hidden_layers):
            out.setdefault(
                f"language_model.model.layers.{i}.mlp.zaya_block.router."
                f"balancing_biases", bb,
            )
        return out

    def _conv_layout(self, key: str, v):
        """Canonicalize conv_qk weights to torch [O, I/g, K] layout (the
        reference normalizes the other way, to MLX [O, K, I/g])."""
        a = self.config.text_config
        inpg = 1 if ".conv_qk.0." in key else a.head_dim
        if v.shape[1] != inpg and v.shape[2] == inpg:
            v = np.asarray(v).transpose(0, 2, 1)
        return v

    @property
    def stack_patterns(self):
        return STACK_PATTERNS
