"""Florence-2: DaViT vision + BART encoder-decoder for unified vision tasks.

Role parity: reference mlx_vlm/models/florence2/florence2.py — 2D learned +
cosine temporal position embeds (:27/:57), spatial/temporal feature pooling
(:204), image-first merge (:238), encoder-decoder generate contract (:318).

Prompting is bare task strings ("<OCR>", "<CAPTION>", ...) — prompt_utils
routes florence2 as a bare-prompt family.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import layer_norm
from .language import LanguageModel, TextConfig
from .vision import DaViTTower, VisionConfig


@dataclasses.dataclass
class ModelConfig:
    vision_config: VisionConfig
    text_config: TextConfig
    model_type: str = "florence2"
    vocab_size: int = 50265
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    image_token_id: int = 51289
    image_feature_source: Tuple[str, ...] = ("temporal_avg_pool",
                                             "spatial_avg_pool")
    image_pos_embed_max: int = 50
    temporal_embed_max: int = 100

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        vc = VisionConfig.from_dict(d.get("vision_config", {}))
        tc = TextConfig.from_dict(d.get("text_config", {}))
        pos = d.get("image_pos_embed", {}) or {}
        tmp = d.get("visual_temporal_embedding", {}) or {}
        return cls(
            vision_config=vc, text_config=tc,
            model_type=d.get("model_type", "florence2"),
            vocab_size=d.get("vocab_size", tc.vocab_size),
            pad_token_id=d.get("pad_token_id", 1),
            bos_token_id=d.get("bos_token_id", 0),
            eos_token_id=d.get("eos_token_id", 2),
            image_token_id=d.get("image_token_id",
                                 d.get("image_token_index", 51289)),
            image_feature_source=tuple(d.get(
                "image_feature_source",
                ("temporal_avg_pool", "spatial_avg_pool"))),
            image_pos_embed_max=pos.get("max_pos_embeddings", 50),
            temporal_embed_max=tmp.get("max_temporal_embeddings", 100),
        )


def _cosine_pos_embed(seq_len: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos 1D table (reference
    PositionalEmbeddingCosine1D:57)."""
    position = np.arange(seq_len)[:, None]
    denom = np.exp(-math.log(10000) * np.arange(dim // 2) / dim)
    freqs = position * denom[None, :]
    out = np.stack([np.sin(freqs), np.cos(freqs)], axis=-1)
    return out.reshape(seq_len, dim).astype(np.float32)


class Model:
    is_encoder_decoder = True

    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = DaViTTower(config.vision_config)
        self.language_model = LanguageModel(config.text_config, config)
        self._temporal_table = None

    # stack patterns for the load pipeline (vision stages stay unstacked —
    # they are heterogeneous across stages)
    stack_patterns = (
        "language_model.model.encoder.layers",
        "language_model.model.decoder.layers",
    )

    # --------------------------------------------------------------- vision
    def _encode_image(self, params, pixel_values: jax.Array) -> jax.Array:
        """[B, H, W, 3] -> projected image token stream [B, T_img, d_model]
        (reference _encode_image:168)."""
        cfg = self.config
        x = self.vision_tower(params["vision_tower"], pixel_values)
        B, N, C = x.shape
        h = w = int(math.isqrt(N))
        # learned 2D position embedding (rows + columns halves)
        rows = params["image_pos_embed"]["row_embeddings"]["weight"]
        cols = params["image_pos_embed"]["column_embeddings"]["weight"]
        pos = jnp.concatenate([
            jnp.broadcast_to(cols[None, :w], (h, w, cols.shape[-1])),
            jnp.broadcast_to(rows[:h, None], (h, w, rows.shape[-1])),
        ], axis=-1).reshape(1, N, C)
        x = x + pos.astype(x.dtype)
        # cosine temporal embedding, T=1 (single frame)
        if self._temporal_table is None:
            self._temporal_table = jnp.asarray(
                _cosine_pos_embed(cfg.temporal_embed_max, C))
        x = x + self._temporal_table[0].astype(x.dtype)

        feats = {
            "spatial_avg_pool": jnp.mean(x, axis=1, keepdims=True),
            "temporal_avg_pool": x,  # T=1: temporal mean == identity
            "last_frame": x,
        }
        x = jnp.concatenate([feats[s] for s in cfg.image_feature_source],
                            axis=1)
        x = x @ params["image_projection"].astype(x.dtype)
        return layer_norm(params["image_proj_norm"], x)

    # ------------------------------------------------------------ embeddings
    def get_input_embeddings(self, params, input_ids: jax.Array,
                             pixel_values: Optional[jax.Array] = None,
                             **kwargs):
        """Encoder input: [image tokens | task prompt embeds]
        (reference get_input_embeddings:267 + merge:238).  input_ids must
        not contain image placeholder tokens (the processor emits the bare
        task prompt)."""
        text = self.language_model.embed(params["language_model"], input_ids)
        if pixel_values is None:
            return text
        img = self._encode_image(params, pixel_values).astype(text.dtype)
        return jnp.concatenate([img, text], axis=1)

    # --------------------------------------------------------------- forward
    def encode(self, params, inputs_embeds, enc_mask=None):
        return self.language_model.encode(params["language_model"],
                                          inputs_embeds, enc_mask)

    def init_decode_cache(self, params, encoder_hidden, enc_mask,
                          capacity: int, dtype=jnp.float32):
        return self.language_model.init_cache(
            params["language_model"], encoder_hidden, enc_mask, capacity,
            dtype)

    def decode(self, params, cache, decoder_input_ids):
        hidden, cache = self.language_model.decode(
            params["language_model"], cache, decoder_input_ids)
        return self.language_model.logits(params["language_model"],
                                          hidden), cache

    # --------------------------------------------------------------- weights
    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "final_logits_bias" in k or "pos_idx_to_embed" in k:
                continue
            if k.startswith("vision_tower."):
                sub = DaViTTower.sanitize({k[len("vision_tower."):]: v})
                for kk, vv in sub.items():
                    out["vision_tower." + kk] = vv
            else:
                out[k] = v
        if ("language_model.lm_head.weight" not in out
                and "language_model.model.shared.weight" in out):
            out["language_model.lm_head.weight"] = out[
                "language_model.model.shared.weight"]
        return out
