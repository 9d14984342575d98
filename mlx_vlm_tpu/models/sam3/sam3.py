"""SAM3: promptable concept segmentation (detector) + video tracker.

Role parity: reference mlx_vlm/models/sam3/sam3.py — DetectorModel
(vision + CLIP text -> DETR -> boxes/masks/presence) and the SAM2-style
TrackerModel, composed under one checkpoint
(detector_model.* / tracker_model.* / tracker_neck.*).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .detector import (
    clip_text_encoder,
    detr_decoder,
    detr_encoder,
    dot_product_scoring,
    geometry_encoder,
    mask_decoder,
)
from .tracker import memory_encoder, track_step
from .vision import fpn_neck, sine_pos_2d, vision_encoder

# ConvTranspose2d weights keep the torch (in, out, kH, kW) layout — they
# are consumed by the einsum-based conv_transpose_2x (vision.py)
_CONVT_PATTERNS = ("scale_layers.", "upscale_conv")
# non-conv 4D parameters
_SKIP_4D = ("memory_temporal_positional_encoding",)


class Model:
    stack_patterns: Tuple = ()

    def __init__(self, config: ModelConfig):
        self.config = config

    # --------------------------------------------------------------- text
    def get_input_embeddings(self, params: dict, input_ids: jax.Array,
                             attention_mask: Optional[jax.Array] = None
                             ) -> jax.Array:
        """Encode text once (cacheable across frames) -> [B, T, d_model]."""
        dp = params["detector_model"]
        det = self.config.detector_config
        hidden = clip_text_encoder(dp["text_encoder"], det.text_config,
                                   input_ids, attention_mask)
        return _lin(dp["text_projection"], hidden)

    # ----------------------------------------------------------- detection
    def detect(self, params: dict, pixel_values: jax.Array,
               input_ids: Optional[jax.Array] = None,
               attention_mask: Optional[jax.Array] = None,
               boxes: Optional[jax.Array] = None,
               inputs_embeds: Optional[jax.Array] = None) -> Dict:
        det = self.config.detector_config
        dp = params["detector_model"]
        B = pixel_values.shape[0]

        fpn = vision_encoder(dp["vision_encoder"], det.vision_config,
                             pixel_values)
        d = det.detr_encoder_config.hidden_size
        fpn_pos = [sine_pos_2d(B, f.shape[1], f.shape[2], d // 2, f.dtype)
                   for f in fpn]
        if getattr(self, "trim_coarsest", True):
            feats = fpn[:-1]      # drop coarsest (scalp=1)
            pos = fpn_pos[:-1]
        else:
            # sam3_1: 3 FPN scales [4x, 2x, 1x], no 0.5x level to drop
            feats = fpn
            pos = fpn_pos

        if inputs_embeds is None:
            inputs_embeds = self.get_input_embeddings(params, input_ids,
                                                      attention_mask)
        prompt = inputs_embeds
        prompt_mask = attention_mask

        enc_feat = feats[-1]
        Bh, H, W, D = enc_feat.shape
        src = enc_feat.reshape(B, H * W, D)
        pos_flat = pos[-1].reshape(B, H * W, D)

        if boxes is not None and boxes.shape[1] > 0:
            n = boxes.shape[1]
            labels = jnp.ones((B, n), jnp.int32)
            bmask = jnp.ones((B, n), jnp.bool_)
            geom, gmask = geometry_encoder(
                dp["geometry_encoder"], det.geometry_encoder_config,
                boxes, labels, bmask, enc_feat, pos[-1])
            if prompt.shape[0] == 1 and geom.shape[0] > 1:
                prompt = jnp.broadcast_to(prompt,
                                          (geom.shape[0],) + prompt.shape[1:])
            prompt = jnp.concatenate([prompt, geom], axis=1)
            if prompt_mask is None:
                prompt_mask = jnp.ones(
                    (prompt.shape[0], inputs_embeds.shape[1]), gmask.dtype)
            prompt_mask = jnp.concatenate(
                [prompt_mask.astype(gmask.dtype), gmask], axis=1)

        encoded = detr_encoder(dp["detr_encoder"], det.detr_encoder_config,
                               src, pos_flat, prompt, prompt_mask)
        hs, ref_boxes, presence = detr_decoder(
            dp["detr_decoder"], det.detr_decoder_config, encoded, prompt,
            pos_flat, prompt_mask, (H, W))

        b = ref_boxes[-1]
        cx, cy, w, h = (b[..., i] for i in range(4))
        boxes_xyxy = jnp.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

        scores = dot_product_scoring(dp["dot_product_scoring"], hs, prompt,
                                     prompt_mask)
        seg = mask_decoder(dp["mask_decoder"], det.mask_decoder_config,
                           hs[-1], list(feats), encoded, prompt, prompt_mask)
        return {
            "pred_logits": scores[-1][..., 0],       # [B, Q]
            "pred_boxes": boxes_xyxy,                # [B, Q, 4] xyxy [0,1]
            "pred_masks": seg["pred_masks"],
            "presence_logits": presence[-1],         # [B, 1]
            "semantic_seg": seg["semantic_seg"],
            "encoder_hidden_states": encoded,
        }

    # ------------------------------------------------------------ tracking
    def backbone_features(self, params: dict,
                          pixel_values: jax.Array) -> jax.Array:
        """Shared ViT features for the tracker path."""
        from .vision import vit_backbone

        return vit_backbone(
            params["detector_model"]["vision_encoder"]["backbone"],
            self.config.detector_config.vision_config.backbone_config,
            pixel_values)

    def track_init(self, params: dict, backbone_feats: jax.Array,
                   detection_masks: jax.Array) -> Dict:
        """Seed tracker memory from detection masks."""
        tc = self.config.tracker_config
        fpn = fpn_neck(params["tracker_neck"], tc.vision_config,
                       backbone_feats)
        features = fpn[2]
        B, H, W, D = features.shape
        m = detection_masks[:, :1].transpose(0, 2, 3, 1)
        if m.shape[1] != 16 * H:
            m = jax.image.resize(m, (B, 16 * H, 16 * W, 1), "nearest")
        mem = memory_encoder(params["tracker_model"]["memory_encoder"], tc,
                             features, m)
        return {"memory": mem.reshape(B, -1, mem.shape[-1]),
                "features": features}

    def track_step(self, params: dict, backbone_feats: jax.Array,
                   memory_bank: Optional[List[jax.Array]] = None,
                   prompt_points=None, prompt_boxes=None, prompt_masks=None,
                   multimask_output: bool = False) -> Dict:
        tc = self.config.tracker_config
        fpn = fpn_neck(params["tracker_neck"], tc.vision_config,
                       backbone_feats)
        high_res = [fpn[1], fpn[0]]   # s1 (2x), s0 (4x) skip order
        return track_step(
            params["tracker_model"], tc, fpn[2], memory_bank,
            prompt_points, prompt_boxes, prompt_masks, multimask_output,
            high_res)

    def __call__(self, params: dict, pixel_values: jax.Array,
                 input_ids: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None,
                 **kwargs) -> Dict:
        if input_ids is not None or kwargs.get("inputs_embeds") is not None:
            return self.detect(params, pixel_values, input_ids,
                               attention_mask, kwargs.get("boxes"),
                               kwargs.get("inputs_embeds"))
        return {"features": self.backbone_features(params, pixel_values)}

    # ------------------------------------------------------------ sanitize
    def sanitize(self, weights: dict) -> dict:
        """Torch->TPU layout: Conv2d OIHW -> HWIO; ConvTranspose2d stays
        torch (in,out,kH,kW) for the einsum lowering; non-conv 4D params
        untouched.  Key names pass through (reference sam3.py sanitize)."""
        out = {}
        for k, v in weights.items():
            if getattr(v, "ndim", 0) == 4:
                if any(s in k for s in _SKIP_4D):
                    pass
                elif any(s in k for s in _CONVT_PATTERNS):
                    pass  # consumed in torch layout by conv_transpose_2x
                else:
                    v = np.asarray(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO
            out[k] = v
        return out


def _lin(p: dict, x: jax.Array) -> jax.Array:
    y = x @ p["weight"].astype(x.dtype).T
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y
