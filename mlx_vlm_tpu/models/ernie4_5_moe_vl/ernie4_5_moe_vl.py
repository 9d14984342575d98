"""ERNIE 4.5 VL MoE top-level model.

Role parity: reference mlx_vlm/models/ernie4_5_moe_vl/ernie4_5_moe_vl.py —
VariableResolutionResamplerModel (:23), get_input_embeddings (:161),
_build_token_type_ids (:253), sanitize (:301).

TPU design: the resampler's even/odd temporal frame gathers are host-side
index computations from grid_thw (they are metadata-only); the gathers
themselves run on device as `jnp.take`.  Feature merge reuses the shared
vectorized masked-gather.  Token types ride as a 4th position_ids channel
(see language.py docstring).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm, linear, rms_norm
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import LanguageModel
from .vision import VisionModel, ernie_vision_rotary_and_segments

STACK_PATTERNS = (
    "language_model.model.dense_pre",
    "language_model.model.moe_layers",
    "language_model.model.dense_post",
    "vision_tower.blocks",
)


def temporal_slice_offsets(grid_thw: np.ndarray, spatial_conv: int):
    """Host-side even/odd frame row indices for the temporal conv
    (reference fwd_placeholder ernie4_5_moe_vl.py:83-126)."""
    g = np.asarray(grid_thw, dtype=np.int64)
    grid_t = g[:, 0]
    hw_after = g[:, 1:].prod(-1) // (spatial_conv**2)
    tokens_per = g.prod(-1) // (spatial_conv**2)
    offsets = np.zeros(len(g), np.int64)
    offsets[1:] = np.cumsum(tokens_per)[:-1]
    even, odd = [], []
    for t, hw, off in zip(grid_t, hw_after, offsets):
        for t0 in range(0, t, 2):
            even.append(np.arange(off + t0 * hw, off + (t0 + 1) * hw))
        for t0 in range(1 if t > 1 else 0, t, 2):
            odd.append(np.arange(off + t0 * hw, off + (t0 + 1) * hw))
    return (
        np.concatenate(even).astype(np.int32),
        np.concatenate(odd).astype(np.int32),
    )


class Resampler:
    """Spatial (2x2 patch concat -> MLP) + temporal (even/odd frame concat ->
    MLP) compression of vision features."""

    def __init__(self, config: ModelConfig):
        self.config = config

    def __call__(self, params, x, even_idx=None, odd_idx=None):
        cfg = self.config
        C = x.shape[-1]
        x = x.reshape(-1, C * cfg.spatial_conv_size**2)
        x = self._mlp_ln(params["spatial_linear"], x)
        if cfg.use_temporal_conv:
            xe = jnp.take(x, even_idx, axis=0)
            xo = jnp.take(x, odd_idx, axis=0)
            x = jnp.concatenate([xe, xo], axis=-1)
            x = self._mlp_ln(params["temporal_linear"], x)
        x = linear(params["mlp"], x)
        return rms_norm(params["after_norm"], x, 1e-5)

    @staticmethod
    def _mlp_ln(p, x):
        x = linear(p["0"], x)
        x = jax.nn.gelu(x, approximate=False)
        x = linear(p["2"], x)
        return layer_norm(p["3"], x, 1e-6)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.resampler_model = Resampler(config)
        self.language_model = LanguageModel(config.text_config, config)

    # ------------------------------------------------------------------ jit
    def vision_features(
        self,
        params: dict,
        pixel_values: jax.Array,
        rotary_freqs: jax.Array,
        segment_ids: jax.Array,
        even_idx: Optional[jax.Array] = None,
        odd_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        h = self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids
        )
        return self.resampler_model(
            params["resampler_model"], h, even_idx, odd_idx
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        even_idx: Optional[jax.Array] = None,
        odd_idx: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        feats = (
            image_features
            if image_features is not None
            else self.vision_features(
                params, pixel_values, rotary_freqs, segment_ids, even_idx, odd_idx
            )
        )
        return merge_input_ids_with_image_features(
            self.config.image_token_id,
            self.config.video_token_id,
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
    def prepare_position_ids(
        self,
        input_ids: np.ndarray,
        image_grid_thw: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        attention_mask: Optional[np.ndarray] = None,
    ):
        pos, deltas = self.language_model.get_rope_index(
            input_ids, image_grid_thw, video_grid_thw, attention_mask
        )
        # 4th channel: token type (0=text, 1=vision) for dual-expert routing
        ids = np.asarray(input_ids)
        is_vis = (ids == self.config.image_token_id) | (
            ids == self.config.video_token_id
        )
        if is_vis.any():
            pos = np.concatenate(
                [pos, is_vis[None].astype(np.int32)], axis=0
            )  # [4, B, S]
        return pos, deltas

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        freqs, segs = ernie_vision_rotary_and_segments(
            grid_thw,
            self.config.vision_config.spatial_merge_size,
            self.vision_tower.head_dim,
        )
        out = {"rotary_freqs": freqs, "segment_ids": segs}
        if self.config.use_temporal_conv:
            even, odd = temporal_slice_offsets(
                grid_thw, self.config.spatial_conv_size
            )
            out["even_idx"] = even
            out["odd_idx"] = odd
        return out

    def sanitize(self, weights: dict) -> dict:
        """HF key remap + expert stacking + layer-group split.

        Reference ernie4_5_moe_vl.py:301-330 + language.py:671-767.
        """
        cfg = self.config.text_config

        def transform(key: str) -> str:
            if "vision_tower" not in key and "vision_model" in key:
                key = key.replace("vision_model", "vision_tower")
            if "language_model" not in key:
                if (
                    key.startswith("model.layers")
                    or key.startswith("model.embed_tokens")
                    or key.startswith("model.norm")
                ):
                    key = "language_model." + key
                elif key.startswith("lm_head"):
                    key = "language_model." + key
            if "model.resampler_model" in key:
                key = key.replace("model.resampler_model", "resampler_model")
            return key

        weights = {transform(k): v for k, v in weights.items()}
        drop = ("mtp_block.", "mtp_linear_proj.", "mtp_hidden_norm.",
                "mtp_emb_norm.")
        weights = {
            k: v for k, v in weights.items()
            if not any(p in k for p in drop)
        }

        n_text = cfg.num_text_experts
        n_mm = cfg.num_mm_experts
        out = {}
        stacks: dict = {}
        layer_re = re.compile(
            r"^language_model\.model\.layers\.(\d+)\.(.+)$"
        )
        expert_re = re.compile(r"^mlp\.experts\.(\d+)\.(.+)$")
        flags = cfg.moe_layer_flags()
        n_pre = flags.index(True) if True in flags else len(flags)
        n_moe = sum(flags)

        def group_key(idx: int, rest: str) -> str:
            if flags[idx]:
                return f"language_model.model.moe_layers.{idx - n_pre}.{rest}"
            if idx < n_pre:
                return f"language_model.model.dense_pre.{idx}.{rest}"
            return (
                f"language_model.model.dense_post.{idx - n_pre - n_moe}.{rest}"
            )

        for k, v in weights.items():
            m = layer_re.match(k)
            if not m:
                out[k] = v
                continue
            idx, rest = int(m.group(1)), m.group(2)
            em = expert_re.match(rest)
            if em:
                e, tail = int(em.group(1)), em.group(2)
                if e < n_text:
                    dest = group_key(idx, f"mlp.experts.{tail}")
                    stacks.setdefault(dest, {})[e] = v
                else:
                    dest = group_key(idx, f"mlp.mm_experts.{tail}")
                    stacks.setdefault(dest, {})[e - n_text] = v
                continue
            if rest == "mlp.moe_statics.e_score_correction_bias":
                b = np.asarray(v)
                if b.ndim == 2 and b.shape[0] == 2:
                    out[group_key(idx, "mlp.e_score_correction_bias")] = b[0]
                    if n_mm > 0:
                        out[group_key(idx, "mlp.e_score_correction_bias_1")] = b[1]
                else:
                    out[group_key(idx, "mlp.e_score_correction_bias")] = (
                        b.reshape(-1)
                    )
                continue
            if rest in ("mlp.gate.weight", "mlp.gate.weight_1"):
                w = np.asarray(v)
                n_e = n_text if rest.endswith(".weight") else n_mm
                if w.shape[0] != n_e:  # HF stores [in, out]
                    w = w.T
                name = ("mlp.gate.weight" if rest.endswith(".weight")
                        else "mlp.gate_1.weight")
                out[group_key(idx, name)] = w
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
