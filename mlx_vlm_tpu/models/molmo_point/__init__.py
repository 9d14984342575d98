"""MolmoPoint (AllenAI): pixel-precise pointing VLM — SigLIP-class ViT +
attention-pooling connector + molmo2-style decoder + a 3-stage point
predictor (patch -> subpatch -> 3x3 location) over an extended vocab.

Role parity: reference mlx_vlm/models/molmo_point — Model
(molmo_point.py:305, _prefill_forward patch-key build :636,
_generate_forward extended logits :717), PointPredictor (:174),
MolmoPointConnector (:126), MolmoPointLogitProcessor grammar (:233),
MolmoPointPatchRope (:102), VisionModel (vision.py:131), LanguageModel
(language.py:200 — same decoder as models/molmo2), point extraction
(point_utils.py:15).

TPU design: plain text/VQA rides the standard generate path (the molmo2
scan decoder with a concat-folded extended lm_head).  Pointing is a
host-driven loop (`generate_points`) over ONE jitted step that returns
(text logits, patch/subpatch/location logits, pre-ln hidden); the
grammar mask and extended-vocab bookkeeping are tiny [V+extra] numpy
vectors on host — exactly the reference's split, minus its per-step
mx scatters.
"""

from __future__ import annotations

import inspect
import math
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear, rms_norm
from ..llama.llama import text_position_ids
from ..molmo2 import LanguageModel as _Molmo2LM
from ..molmo2 import TextConfig as _Molmo2Text
from ..molmo2 import _mhdpa

EXTRACT_POINT_TRIPLE = re.compile(
    r"<POINT_(\d+)> ?<POINT_(\d+)> ?<POINT_(\d+)> ?([0-9]+)")


@dataclass
class TextConfig(_Molmo2Text):
    model_type: str = "molmo2_text"


@dataclass
class VisionConfig(BaseModelConfig):
    model_type: str = "molmo2"
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 72
    layer_norm_eps: float = 1e-6
    image_patch_size: int = 14
    image_num_pos: int = 729


@dataclass
class AdapterConfig(BaseModelConfig):
    model_type: str = "molmo_point"
    vit_layers: Tuple[int, ...] = (-3, -9)
    pooling_attention_mask: bool = False
    hidden_size: int = 1152
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 72
    intermediate_size: int = 12288
    text_hidden_size: int = 4096
    positional_embeddings: Optional[int] = None


@dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "molmo_point"
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    adapter_config: AdapterConfig = None
    eos_token_id: Optional[Union[int, List[int]]] = None

    image_start_token_id: int = 151936
    image_end_token_id: int = 151937
    image_patch_id: int = 151938
    image_col_id: int = 151939
    image_non_indexable_patch_id: int = 151942
    patch_token_id: int = 151947
    subpatch_token_id: int = 151948
    location_token_id: int = 151949

    patch_location: Optional[str] = "3x3"
    no_more_points_class: bool = True
    patch_embed_dim: int = 512
    layer_norm_x: bool = True
    norm_logits: bool = True
    mask_patches: Optional[str] = "always"
    mask_subpatches: str = "inference"
    mask_repeats: Optional[str] = "inference"
    token_prediction_rotary: str = "one_d"
    token_prediction_rotary_theta: Optional[float] = 50000.0

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        vc = dict(params.get("vit_config")
                  or params.get("vision_config") or {})
        ac = AdapterConfig.from_dict(params.get("adapter_config", {}) or {})
        # truncate the ViT to the deepest adapter tap (reference
        # molmo_point.py:330 — checkpoints carry only those layers)
        L = vc.get("num_hidden_layers", 27)
        taps = [t if t >= 0 else t + L for t in ac.vit_layers]
        vc["num_hidden_layers"] = min(L, max(taps) + 1)
        params["vision_config"] = VisionConfig.from_dict(vc)
        params["adapter_config"] = ac
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


# ------------------------------------------------------------- point rope
def patch_rope(x: jax.Array, pos: jax.Array, theta: float) -> jax.Array:
    """1D rotary over point-predictor keys/queries [N, dim] (reference
    MolmoPointPatchRope:102; rotate-half convention)."""
    dim = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = pos.astype(jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rot * sin).astype(x.dtype)


class GeneratedTokenBounds:
    """Extended-vocab layout (reference molmo_point.py:208)."""

    def __init__(self, vocab_size, n_patches, n_subpatches, n_locations,
                 no_more_points_class):
        self.n_locations = n_locations
        self.n_patches = n_patches
        self.n_subpatches = n_subpatches
        self.vocab_size = vocab_size
        self.no_more_points_token_id = (
            vocab_size + n_patches if no_more_points_class else -1)
        self.patch_start = vocab_size
        self.patch_end_without_no_more_points = vocab_size + n_patches
        self.patch_end = vocab_size + n_patches + int(no_more_points_class)
        self.subpatch_start = self.patch_end
        self.subpatch_end = self.subpatch_start + n_subpatches
        self.location_start = self.subpatch_end
        self.location_end = self.subpatch_end + n_locations


def grammar_mask(bounds: GeneratedTokenBounds, generated: List[int],
                 last_token: int, total: int, *, prevent_repeats: bool,
                 force_patch_sorted: bool, force_subpatch_sorted: bool
                 ) -> np.ndarray:
    """Valid-order mask over the extended vocab (numpy port of reference
    MolmoPointLogitProcessor.__call__:246)."""
    b = bounds
    NEG = np.float32(-1e9)
    mask = np.zeros(total, np.float32)
    skip = 2 if b.n_locations else 1
    last_patch = last_subpatch = None
    no_more = any(t == b.no_more_points_token_id for t in generated)
    for t in generated[: len(generated) - skip]:
        if b.patch_start <= t < b.patch_end:
            last_patch = t
        elif b.subpatch_start <= t < b.subpatch_end:
            last_subpatch = t
    if no_more:
        mask[b.patch_start: b.location_end] = NEG
    elif last_token < b.patch_start or last_token >= b.subpatch_end:
        mask[b.subpatch_start: b.location_end] = NEG
        if force_patch_sorted and last_patch is not None:
            mask[b.patch_start: last_patch] = NEG
        if (prevent_repeats and force_subpatch_sorted
                and last_subpatch == b.subpatch_end - 1
                and last_patch is not None):
            mask[last_patch] = NEG
    elif b.patch_start <= last_token < b.patch_end:
        mask[: b.subpatch_start] = NEG
        mask[b.subpatch_end:] = NEG
        if (force_subpatch_sorted and last_patch == last_token
                and last_subpatch is not None):
            hi = last_subpatch + 1 if prevent_repeats else last_subpatch
            mask[b.subpatch_start: hi] = NEG
    elif b.n_locations and b.subpatch_start <= last_token < b.subpatch_end:
        mask[: b.location_start] = NEG
        mask[b.location_end:] = NEG
    return mask


def extract_points_from_text(output_text: str, pointing_metadata: dict,
                             no_more_points_class: bool = True,
                             patch_location: Optional[str] = "3x3"):
    """<POINT_a> <POINT_b> <POINT_c> id -> (id, image_ix, x, y) pixels
    (reference point_utils.py:15)."""
    pooling = pointing_metadata["token_pooling"]
    mappings = pointing_metadata["subpatch_mapping"]
    image_sizes = pointing_metadata["image_sizes"]
    n_patches, n_subpatches = pooling.shape[-2:]
    if no_more_points_class:
        n_patches += 1
    points = []
    for m in EXTRACT_POINT_TRIPLE.finditer(output_text):
        patch_id = int(m.group(1))
        subpatch_id = int(m.group(2)) - n_patches
        location_id = (int(m.group(3)) - n_patches - n_subpatches
                       if patch_location else None)
        example_id = int(m.group(4))
        vit_patch_id = pooling[patch_id, subpatch_id]
        for image_ix, (mapping, (w, h)) in enumerate(
                zip(mappings, image_sizes)):
            coords = np.argwhere(mapping == int(vit_patch_id))
            if len(coords) == 1:
                p_y, p_x = coords[0]
                if location_id is not None:
                    p_x += (location_id // 3 + 0.5) * 0.33
                    p_y += (location_id % 3 + 0.5) * 0.33
                else:
                    p_x, p_y = p_x + 0.5, p_y + 0.5
                points.append((example_id, image_ix,
                               (p_x / mapping.shape[1]) * w,
                               (p_y / mapping.shape[0]) * h))
                break
    return points


class VisionModel:
    """SigLIP-class ViT returning the concat of adapter tap layers
    (reference vision.py:131 + molmo_point.py vit_layers:325)."""

    def __init__(self, config: VisionConfig, adapter: AdapterConfig):
        self.config = config
        L = config.num_hidden_layers
        self.vit_layers = [t if t >= 0 else t + L
                           for t in adapter.vit_layers]

    def __call__(self, params: dict, patches: jax.Array) -> jax.Array:
        cfg = self.config
        x = linear(params["patch_embedding"], patches)
        x = x + params["positional_embedding"][None].astype(x.dtype)

        def block(h, lp):
            y = layer_norm(lp["attention_norm"], h, cfg.layer_norm_eps)
            y = _mhdpa(lp["attention"], y, y, cfg.num_attention_heads,
                       cfg.head_dim)
            h = h + y
            y = layer_norm(lp["ffn_norm"], h, cfg.layer_norm_eps)
            y = linear(lp["feed_forward"]["w2"], jax.nn.gelu(
                linear(lp["feed_forward"]["w1"], y), approximate=True))
            return h + y, h + y

        _, hiddens = jax.lax.scan(block, x, params["resblocks"])
        return jnp.concatenate([hiddens[i] for i in self.vit_layers],
                               axis=-1)


class LanguageModel(_Molmo2LM):
    pass


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_model = VisionModel(config.vision_config,
                                        config.adapter_config)

    # ------------------------------------------------------------- vision
    def vision_pool(self, params, pixel_values, pooled_patches_idx):
        """crops [N, n_patch, pdim] + absolute gather idx [n_pool, k] ->
        (pooled LLM features [n_pool, D], vit gathered [n_pool, k, vd],
        window valid mask) — reference connector path
        (molmo_point.py:385-466)."""
        ad = self.config.adapter_config
        feats = self.vision_model(params["vision_model"], pixel_values)
        flat = feats.reshape(-1, feats.shape[-1])
        valid = pooled_patches_idx >= 0
        idx = jnp.maximum(pooled_patches_idx, 0)
        gathered = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            *pooled_patches_idx.shape, flat.shape[-1])
        gathered = gathered * valid[..., None].astype(gathered.dtype)
        cp = params["connector"]
        to_pool = gathered
        if ad.positional_embeddings:
            to_pool = to_pool + cp["positional_embeddings"]["bias"][
                None, : to_pool.shape[-2]].astype(to_pool.dtype)
        if ad.pooling_attention_mask:
            mask = valid[:, None, None, :]
        else:
            to_pool = to_pool * valid[..., None].astype(to_pool.dtype)
            mask = None
        denom = jnp.maximum(valid.sum(-1, keepdims=True), 1)
        query = to_pool.sum(-2, keepdims=True) / denom[..., None].astype(
            to_pool.dtype)
        pooled = _mhdpa(cp["image_pooling_2d"], query, to_pool,
                        ad.num_attention_heads, ad.head_dim, mask)[:, 0]
        pr = cp["image_projector"]
        pooled = linear(pr["w2"], jax.nn.silu(linear(pr["w1"], pooled))
                        * linear(pr["w3"], pooled))
        return pooled, gathered, valid

    # ------------------------------------------------------------- embeds
    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             pooled_patches_idx=None, **aux):
        cfg = self.config
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None:
            return embeds
        pooled, _, _ = self.vision_pool(params, pixel_values,
                                        pooled_patches_idx)
        # ADDITIVE merge at indexable + non-indexable image token slots,
        # in order (reference :470-478)
        B, S, D = embeds.shape
        flat_ids = input_ids.reshape(-1)
        is_img = (flat_ids == cfg.image_patch_id) | (
            flat_ids == cfg.image_non_indexable_patch_id)
        order = jnp.cumsum(is_img) - 1
        add = jnp.where(
            is_img[:, None],
            jnp.take(pooled, jnp.clip(order, 0, pooled.shape[0] - 1),
                     axis=0), 0)
        return (embeds.reshape(B * S, D)
                + add.astype(embeds.dtype)).reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    # ----------------------------------------------------- point predictor
    def _x_norm(self, params, h):
        pp = params["point_predictor"]
        if self.config.layer_norm_x:
            return rms_norm(pp["x_norm"], h,
                            self.config.text_config.layer_norm_eps)
        return h / math.sqrt(self.config.text_config.hidden_size)

    def _build_point_cache(self, params, pre_ln, input_ids,
                           vit_gathered) -> Dict:
        """Patch/subpatch keys from the prefill hidden state (reference
        _prefill_forward:636)."""
        cfg = self.config
        pp = params["point_predictor"]
        ids = np.asarray(input_ids)[0]
        is_indexable = ids == cfg.image_patch_id
        is_img = is_indexable | (ids == cfg.image_non_indexable_patch_id)
        img_pos = np.nonzero(is_img)[0]
        # rotary position = cumsum of indexable tokens - 1 at each slot
        cum = np.cumsum(is_indexable.astype(np.int64)) - 1
        image_pos_ids = cum[img_pos].astype(np.int32)

        theta = (cfg.token_prediction_rotary_theta
                 or cfg.text_config.rope_theta)
        x_norm = self._x_norm(params, pre_ln[0])
        pk = linear(pp["patch_k"], jnp.take(x_norm, jnp.asarray(img_pos),
                                            axis=0))
        if cfg.token_prediction_rotary == "one_d":
            pk = patch_rope(pk, jnp.asarray(image_pos_ids), theta)
        pk_mask = is_indexable[img_pos]
        if cfg.no_more_points_class:
            pk = jnp.concatenate(
                [pk, pp["add_no_point_class_embed"]["vector"][None].astype(
                    pk.dtype)], axis=0)
            pk_mask = np.concatenate([pk_mask, [True]])
        spk = linear(pp["subpatch_k"], vit_gathered)
        return {
            "patch_k": pk, "patch_k_mask": jnp.asarray(pk_mask),
            "subpatch_k": spk, "image_pos_ids": image_pos_ids,
            "theta": theta,
        }

    # --------------------------------------------------------- point loop
    def generate_points(self, processor, *, image=None, prompt: str,
                        max_new_tokens: int = 64):
        """Host-driven greedy pointing loop (reference
        _generate_forward:717 + MolmoPointLogitProcessor).  Returns
        (output_text, points [(id, image_ix, x, y)])."""
        cfg = self.config
        params = self.params
        images = image if isinstance(image, list) else [image]
        out = processor(text=[prompt], images=images)
        input_ids = np.asarray(out["input_ids"])
        meta = processor._pointing_metadata
        pv = jnp.asarray(out["pixel_values"])
        pool_idx = jnp.asarray(out["pooled_patches_idx"])

        pooled, vit_gathered, _ = jax.jit(self.vision_pool)(
            params, pv, pool_idx)
        lm = self.language_model
        lmp = params["language_model"]
        embeds = lm.embed(lmp, jnp.asarray(input_ids))
        flat_ids = input_ids.reshape(-1)
        is_img = (flat_ids == cfg.image_patch_id) | (
            flat_ids == cfg.image_non_indexable_patch_id)
        order = np.cumsum(is_img) - 1
        add = np.where(is_img[:, None],
                       np.asarray(pooled)[np.clip(order, 0, None)], 0)
        embeds = embeds + jnp.asarray(add, embeds.dtype)[None]

        S = input_ids.shape[1]
        cache = lm.init_cache(1, S + max_new_tokens + 4, embeds.dtype)
        pos = jnp.arange(S, dtype=jnp.int32)[None]
        (h, pre_ln), cache = lm(lmp, embeds, cache, pos,
                                return_pre_ln=True)
        logits = np.asarray(lm.logits(lmp, h)[:, -1])[0]

        pc = self._build_point_cache(params, pre_ln, input_ids,
                                     vit_gathered)
        n_pooled, n_sub = vit_gathered.shape[0], vit_gathered.shape[1]
        total_vocab = (cfg.text_config.vocab_size
                       + cfg.text_config.additional_vocab_size)
        bounds = GeneratedTokenBounds(
            total_vocab, n_pooled, n_sub,
            9 if cfg.patch_location else 0, cfg.no_more_points_class)

        pp = params["point_predictor"]
        pd = int(pc["patch_k"].shape[-1])

        @jax.jit
        def step(params, cache, embed, pos1, rotate_by, patch_sel):
            lmp = params["language_model"]
            (h, pre), cache = lm(lmp, embed, cache,
                                 pos1[None, None], return_pre_ln=True)
            text_logits = lm.logits(lmp, h)[0, -1]
            x_norm = self._x_norm(params, pre[0, -1:])
            ppp = params["point_predictor"]
            q = linear(ppp["patch_q"], x_norm)
            if cfg.token_prediction_rotary == "one_d":
                q = patch_rope(q, rotate_by[None], pc["theta"])
            dots = (q @ pc["patch_k"].T)[0]
            if cfg.norm_logits:
                dots = dots / math.sqrt(pd)
            patch_logits = jnp.where(pc["patch_k_mask"], dots, -1e5)
            sp_q = linear(ppp["subpatch_q"], x_norm)[0]
            spk = pc["subpatch_k"][jnp.clip(patch_sel, 0, n_pooled - 1)]
            sp = jnp.sum(sp_q[None] * spk, axis=-1)
            if cfg.norm_logits:
                sp = sp / math.sqrt(pd)
            loc = (linear(ppp["subpatch_loc_k"], pre[0, -1])
                   if "subpatch_loc_k" in ppp else jnp.full((9,), -1e5))
            return text_logits, patch_logits, sp, loc, cache

        img_feats = np.asarray(pooled)  # [n_pooled, D]
        vitg = vit_gathered
        generated: List[int] = []
        text_parts: List[int] = []
        out_text = ""
        last_patch_sel = -1
        delta_pos = S

        def extend(tl, pl, sp, loc, first):
            """Merge text + point logits into the extended vocab row
            (reference :836-905)."""
            V = tl.shape[0]
            row = np.full(bounds.location_end, -1e5, np.float32)
            row[:V] = tl
            if first:
                return row  # prefill step: dummy point logits
            patch_tok_logit = tl[cfg.patch_token_id]
            row[cfg.patch_token_id] = -1e5
            row[cfg.subpatch_token_id] = -1e5
            row[cfg.location_token_id] = -1e5
            sel = int(np.argmax(pl))
            row[bounds.patch_start + sel] = patch_tok_logit
            row[bounds.subpatch_start: bounds.subpatch_end] = sp
            row[bounds.location_start: bounds.location_end] = loc
            return row

        row = extend(logits, None, None, None, True)
        for _ in range(max_new_tokens):
            if generated:
                row = row + grammar_mask(
                    bounds, generated, generated[-1], bounds.location_end,
                    prevent_repeats=cfg.mask_repeats in (
                        "all", "inference"),
                    force_patch_sorted=cfg.mask_patches in (
                        "always", "inference"),
                    force_subpatch_sorted=cfg.mask_subpatches in (
                        "always", "inference"))
            tok = int(np.argmax(row))
            generated.append(tok)
            eos = cfg.eos_token_id
            eos = ([eos] if isinstance(eos, int) else (eos or []))
            if tok in eos:
                break
            # decode + build the next input embedding
            if tok >= bounds.patch_start:
                out_text += f"<POINT_{tok - bounds.patch_start}>"
            else:
                text_parts.append(tok)
                out_text += processor.decode([tok])
            is_patch = bounds.patch_start <= tok \
                < bounds.patch_end_without_no_more_points
            is_nomore = tok == bounds.no_more_points_token_id
            is_sub = bounds.subpatch_start <= tok < bounds.subpatch_end
            is_loc = bounds.location_start <= tok < bounds.location_end
            if is_patch or is_nomore:
                dec = cfg.patch_token_id
            elif is_sub:
                dec = cfg.subpatch_token_id
            elif is_loc:
                dec = cfg.location_token_id
            else:
                dec = tok
            e = lm.embed(lmp, jnp.asarray([[dec]], jnp.int32))
            rotate_by = 0
            if is_patch:
                pid = tok - bounds.patch_start
                last_patch_sel = pid
                e = e + jnp.asarray(img_feats[pid], e.dtype)[None, None]
                rotate_by = int(pc["image_pos_ids"][pid]) \
                    if pid < len(pc["image_pos_ids"]) else 0
            elif is_sub and last_patch_sel >= 0:
                spid = tok - bounds.subpatch_start
                vrow = vitg[last_patch_sel, spid][None]
                e = linear(params["build_vit_embedding"], vrow)[None]
                rotate_by = int(pc["image_pos_ids"][last_patch_sel]) \
                    if last_patch_sel < len(pc["image_pos_ids"]) else 0
            elif last_patch_sel >= 0:
                rotate_by = int(pc["image_pos_ids"][last_patch_sel]) \
                    if last_patch_sel < len(pc["image_pos_ids"]) else 0
            tl, pl, sp, loc, cache = step(
                params, cache, e.astype(embeds.dtype),
                jnp.asarray(delta_pos, jnp.int32),
                jnp.asarray(rotate_by, jnp.int32),
                jnp.asarray(max(last_patch_sel, 0), jnp.int32))
            delta_pos += 1
            row = extend(np.asarray(tl), np.asarray(pl), np.asarray(sp),
                         np.asarray(loc), False)

        points = extract_points_from_text(
            out_text, meta, cfg.no_more_points_class, cfg.patch_location)
        return out_text, points

    # ------------------------------------------------------------ sanitize
    def sanitize(self, weights: dict) -> dict:
        out = {}
        head = {}
        for k, v in weights.items():
            if k.startswith("model."):
                k = k[len("model."):]
            if k.startswith("lm_head."):
                head[k[len("lm_head."):]] = v
                continue
            if k.startswith("transformer."):
                k = "language_model.model." + k[len("transformer."):]
            k = k.replace("vit.transformer.resblocks", "vision_model.resblocks")
            if k.startswith("vit."):
                k = "vision_model." + k[len("vit."):]
            out[k] = v
        if head:
            # concat-fold the split extended head (reference
            # ExtendedLmHead.fuse:183)
            if "output_embeddings" in head:
                w = head["output_embeddings"]
                if "new_output_embeddings" in head:
                    w = np.concatenate(
                        [w, head["new_output_embeddings"]], axis=0)
                out["language_model.lm_head.weight"] = w
            else:
                for k, v in head.items():
                    out["language_model.lm_head." + k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.blocks", "vision_model.resblocks")


__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "AdapterConfig", "LanguageModel", "VisionModel",
           "extract_points_from_text", "grammar_mask",
           "GeneratedTokenBounds", "patch_rope"]
