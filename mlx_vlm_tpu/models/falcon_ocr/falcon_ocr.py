"""Falcon-OCR: encoder-free OCR VLM with golden-ratio 3-D rotary.

Role parity: reference mlx_vlm/models/falcon_ocr/ — pixels are patchified
and LINEARLY projected straight into the decoder (no vision tower,
falcon_ocr.py:_patchify_and_project:64); attention uses a 3-D rotary
split: 1-D temporal rope on the first half of each head (interleaved
pairs, language.py:24) and a LEARNED per-head golden-ratio 2-D rotary on
the second half driven by normalized (h, w) patch coordinates
(compute_golden_freqs:45, compute_pos_hw:89); image tokens share one
frozen temporal position (get_rope_index:437) and attend bidirectionally
within their image block (create_falcon_ocr_mask:120); attention sinks;
unit-weight rms pre-norms inside attention/MLP; relu^2-gated w13 MLP.

TPU design: the prompt-dependent (pos_hw, bidirectional-block-mask)
pair is computed HOST-side in prepare_position_ids and baked into the
single-chunk prefill trace (`no_chunked_prefill`); the decode program
never needs them (text tokens carry hw = (0,0) => identity rotation), so
the hot loop stays shape-stable and cached.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core import cache as cache_lib
from ...ops.attention import sdpa
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "falcon_ocr"
    hidden_size: int = 768
    num_hidden_layers: int = 22
    num_attention_heads: int = 16
    head_dim: int = 64
    num_key_value_heads: int = 8
    vocab_size: int = 65536
    intermediate_size: int = 2304
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "falcon_ocr"
    spatial_patch_size: int = 16
    temporal_patch_size: int = 1
    channel_size: int = 3


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig
    vision_config: VisionConfig
    model_type: str = "falcon_ocr"
    img_id: int = 227
    image_cls_token_id: int = 244
    img_end_id: int = 230
    eos_token_id: Optional[List[int]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", params) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def _rot_pairs(x, cos, sin):
    """Interleaved-pair rotation: (x[2i], x[2i+1]) by angle_i.

    x [..., 2F]; cos/sin broadcastable to [..., F]."""
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    oe = xe * cos - xo * sin
    oo = xe * sin + xo * cos
    return jnp.stack([oe, oo], axis=-1).reshape(x.shape).astype(x.dtype)


def compute_pos_hw(ids: np.ndarray, image_token_id: int,
                   grids) -> np.ndarray:
    """Normalized golden (h, w) coordinates per token [1, S, 2]
    (reference language.py:89: zeros for text tokens)."""
    ids = np.asarray(ids).reshape(-1)
    S = len(ids)
    out = np.zeros((1, S, 2), np.float32)
    img_pos = np.nonzero(ids == image_token_id)[0]
    if len(img_pos) == 0 or grids is None:
        return out
    coords = []
    for gh, gw in grids:
        gh, gw = int(gh), int(gw)
        rh = (gh / gw) ** 0.5
        rw = (gw / gh) ** 0.5
        for hi in range(gh):
            for wi in range(gw):
                coords.append((-rh + 2 * rh * hi / max(gh - 1, 1),
                               -rw + 2 * rw * wi / max(gw - 1, 1)))
    for i, tok in enumerate(img_pos):
        if i < len(coords):
            out[0, tok] = coords[i]
    return out


def falcon_block_mask(ids: np.ndarray, start_id: int,
                      end_id: int) -> np.ndarray:
    """[S, S] bool: causal | bidirectional-within-image-block
    (reference create_falcon_ocr_mask:120)."""
    ids = np.asarray(ids).reshape(-1)
    soi = np.cumsum(ids == start_id)
    eoi = np.cumsum(ids == end_id)
    in_img = (soi - eoi) > 0
    blk = soi * in_img
    q = np.arange(len(ids))
    causal = q[:, None] >= q[None, :]
    same = (in_img[:, None] & in_img[None, :]
            & (blk[:, None] == blk[None, :]))
    return causal | same


def falcon_position_ids(ids: np.ndarray, start_id: int,
                        end_id: int) -> Tuple[np.ndarray, int]:
    """Temporal positions frozen inside image blocks + rope delta
    (reference get_rope_index:437)."""
    ids = np.asarray(ids).reshape(-1)
    pos = np.zeros(len(ids), np.int32)
    in_img = False
    nxt = 0
    for i, tok in enumerate(ids):
        if tok == start_id and not in_img:
            in_img = True
        pos[i] = nxt
        if not in_img:
            nxt += 1
        if tok == end_id and in_img:
            in_img = False
            nxt += 1
    delta = int(pos.max()) + 1 - len(ids)
    return pos, delta


class LanguageModel:
    def __init__(self, args: TextConfig, config: ModelConfig = None):
        self.args = args
        self.config = config or args
        self.n_heads = args.num_attention_heads
        self.n_kv_heads = args.num_key_value_heads
        self.head_dim = args.head_dim
        self.scale = args.head_dim**-0.5
        self.rope_dim = args.head_dim // 2  # temporal half
        inv = 1.0 / (args.rope_theta ** (
            np.arange(0, self.rope_dim, 2, dtype=np.float32)
            / self.rope_dim))
        self.inv_freq_1d = jnp.asarray(inv)
        # prompt-dependent host plans set by Model.prepare_position_ids
        self.pos_hw_np: Optional[np.ndarray] = None
        self.block_mask_np: Optional[np.ndarray] = None

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        # K/V cached post-rope at FULL head count (golden rotary is
        # per-head, so GQA keys are expanded before rope — reference :199)
        return cache_lib.init_cache(
            self.args.num_hidden_layers, batch_size, self.n_heads,
            self.head_dim, capacity, dtype, left_pad)

    def embed(self, params, input_ids):
        return embedding(params["model"]["embed_tokens"], input_ids)

    def logits(self, params, hidden):
        if self.args.tie_word_embeddings or "lm_head" not in params:
            return embedding_as_linear(params["model"]["embed_tokens"],
                                       hidden)
        return linear(params["lm_head"], hidden)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, _ = inputs_embeds.shape
        pos = position_ids[0] if position_ids.ndim == 3 else position_ids
        mp = params["model"]
        eps = a.rms_norm_eps
        nh, nkv, hd = self.n_heads, self.n_kv_heads, self.head_dim
        half = hd // 2
        unit = {"weight": jnp.ones((), jnp.float32)}

        ang = pos.astype(jnp.float32)[..., None] * self.inv_freq_1d
        cos1, sin1 = jnp.cos(ang), jnp.sin(ang)  # [B, S, rope_dim/2]
        cos1 = cos1[:, None]  # [B, 1, S, F]
        sin1 = sin1[:, None]

        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        prefill = S > 1
        if prefill and self.block_mask_np is not None:
            bm = self.block_mask_np
            pad = np.zeros((S, S), bool)
            n = min(S, bm.shape[0])
            pad[:n, :n] = bm[:n, :n]
            extra = jnp.zeros(mask.shape, bool).at[..., :S].set(
                jnp.asarray(pad)[None, None])
            mask = mask | extra
        cos2 = sin2 = None
        if prefill and self.pos_hw_np is not None:
            hw = np.zeros((1, S, 2), np.float32)
            n = min(S, self.pos_hw_np.shape[1])
            hw[:, :n] = self.pos_hw_np[:, :n]
            fg = params["model"]["freqs_cis_golden"].astype(jnp.float32)
            theta = jnp.einsum("bsp,hfp->bhsf", jnp.asarray(hw), fg)
            cos2, sin2 = jnp.cos(theta), jnp.sin(theta)

        def layer(h, lp, cxs):
            x = rms_norm(unit, h, eps)
            qkv = linear(lp["self_attn"]["wqkv"], x)
            qs = nh * hd
            ks = nkv * hd
            q = qkv[..., :qs].reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
            k = qkv[..., qs:qs + ks].reshape(B, S, nkv, hd).transpose(
                0, 2, 1, 3)
            v = qkv[..., qs + ks:].reshape(B, S, nkv, hd).transpose(
                0, 2, 1, 3)
            q = rms_norm(unit, q, eps)
            k = rms_norm(unit, k, eps)
            rep = nh // nkv
            if rep > 1:  # per-head golden rotary needs full-head K/V
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)
            q_t = _rot_pairs(q[..., :half], cos1, sin1)
            k_t = _rot_pairs(k[..., :half], cos1, sin1)
            q_hw, k_hw = q[..., half:], k[..., half:]
            if cos2 is not None:
                q_hw = _rot_pairs(q_hw, cos2, sin2)
                k_hw = _rot_pairs(k_hw, cos2, sin2)
            q = jnp.concatenate([q_t, q_hw], axis=-1)
            k = jnp.concatenate([k_t, k_hw], axis=-1)
            kc, vc = cache_lib.update_layer(cxs[0], cxs[1], k, v,
                                            cache.offset)
            o = sdpa(q, kc, vc, self.scale, mask,
                     sinks=lp["self_attn"]["sinks"])
            o = o.transpose(0, 2, 1, 3).reshape(B, S, -1)
            h = h + linear(lp["self_attn"]["wo"], o)
            x = rms_norm(unit, h, eps)
            w13 = linear(lp["mlp"]["w13"], x)
            g, u = jnp.split(w13, 2, axis=-1)
            h = h + linear(lp["mlp"]["w2"], jax.nn.relu(g) ** 2 * u)
            return h, (kc, vc)

        from ...core.quant_scan import scan_layers

        h, cys = scan_layers(layer, inputs_embeds, mp["layers"],
                             cache.scan_arrays())
        h = rms_norm(mp["norm"], h, eps)
        return h, (None if made else cache.with_arrays(cys, S))


class Model:
    no_chunked_prefill = True

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             image_features=None, **aux):
        lm = params["language_model"]
        embeds = self.language_model.embed(lm, input_ids)
        if pixel_values is None and image_features is None:
            return embeds
        if image_features is None:
            # encoder-free: patchify + linear projection
            # (pixel_values arrives pre-patchified [N, ps*ps*C*pt])
            px = pixel_values
            if px.ndim == 4:
                vc = self.config.vision_config
                ps = vc.spatial_patch_size
                N, H, W, C = px.shape
                px = px.reshape(N, H // ps, ps, W // ps, ps, C)
                px = px.transpose(0, 1, 3, 2, 4, 5).reshape(
                    -1, ps * ps * C * vc.temporal_patch_size)
            image_features = linear(lm["model"]["img_projector"], px)
        return merge_input_ids_with_image_features(
            self.config.img_id, -1, image_features, embeds, input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        cfg = self.config
        ids = np.asarray(input_ids)
        pos, delta = falcon_position_ids(ids, cfg.image_cls_token_id,
                                         cfg.img_end_id)
        grids = None
        if image_grid_thw is not None:
            grids = [(int(r[-2]), int(r[-1]))
                     for r in np.asarray(image_grid_thw)]
        # host-side prompt plans baked into the single-chunk prefill
        self.language_model.pos_hw_np = compute_pos_hw(
            ids, cfg.img_id, grids)
        self.language_model.block_mask_np = falcon_block_mask(
            ids, cfg.image_cls_token_id, cfg.img_end_id)
        B, S = ids.shape
        pos3 = np.broadcast_to(pos[None, None], (3, B, S)).copy()
        return pos3, np.full((B, 1), delta, np.int32)

    def vision_aux_inputs(self, grid_thw):
        return {}

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            nk = k
            if k.startswith("tok_embeddings."):
                nk = k.replace("tok_embeddings.",
                               "language_model.model.embed_tokens.", 1)
            elif k.startswith("img_projector."):
                nk = k.replace("img_projector.",
                               "language_model.model.img_projector.", 1)
            elif k.startswith("norm."):
                nk = k.replace("norm.", "language_model.model.norm.", 1)
            elif k.startswith("output."):
                nk = k.replace("output.", "language_model.lm_head.", 1)
            elif k == "freqs_cis_golden":
                nk = "language_model.model.freqs_cis_golden"
            elif k.startswith("layers."):
                nk = k.replace("layers.", "language_model.model.layers.", 1)
                nk = nk.replace(".attention.", ".self_attn.")
                nk = nk.replace(".feed_forward.", ".mlp.")
            if ".w13." in nk and getattr(v, "ndim", 0) >= 1:
                # checkpoint interleaves gate/up rows (reference :162)
                v = np.concatenate([v[0::2], v[1::2]], axis=0)
            out[nk] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
