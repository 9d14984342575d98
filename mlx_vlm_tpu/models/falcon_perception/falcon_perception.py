"""Falcon-Perception: detection/segmentation VLM with a linear patch
projector, Fourier coord/size codecs and an AnyUp segmentation head.

Role parity: reference mlx_vlm/models/falcon_perception/
falcon_perception.py — FourierEncoder:15, BboxDecoder:27, SegmDecoder:37,
Model (patchify/_merge/positions):54, compute_segm_features:316,
decode_segm_mask:411, generate_perception:521, sanitize:754.

TPU design: no separate vision tower — pixel patches are a reshape +
one matmul into the decoder width (the reference runs this inside the
LM too).  All prompt-dependent geometry (collapsed positions, golden
(h,w) coords, image block ids) is computed host-side in numpy by
prepare_position_ids and handed to the step program as cache planes;
the perception decode loop is host-driven over a jitted single-token
step that returns (logits, hidden) so coord/size/seg decode heads read
the same hidden state the reference reads.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from .anyup import anyup
from .config import ModelConfig, TextConfig, VisionConfig  # noqa: F401
from .language import LanguageModel

STACK_PATTERNS = ("language_model.model.layers",)


def fourier_encode(p: dict, x: jax.Array) -> jax.Array:
    """FourierEncoder (reference :15): sin/cos of a learned projection."""
    f = 2.0 * math.pi * linear(p["embed"], x)
    f = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)
    return linear(p["transform"], f)


def bbox_decode(p: dict, x: jax.Array) -> jax.Array:
    """BboxDecoder (reference :27): w2(relu(w1 x)^2)."""
    return linear(p["w2"], jnp.square(jax.nn.relu(linear(p["w1"], x))))


def segm_project(p: dict, x: jax.Array, num_layers: int) -> jax.Array:
    """SegmDecoder (reference :37)."""
    for i in range(num_layers - 1):
        x = jnp.square(jax.nn.relu(linear(p["layers"][str(i)], x)))
    return linear(p["pixel_layer"], x)


class Model:
    no_chunked_prefill = True

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)

    # --------------------------------------------------------- embedding
    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is None:
            return embeds
        feats = self._patchify_and_project(params, pixel_values)
        return merge_input_ids_with_image_features(
            self.config.img_id, self.config.img_id,
            feats, embeds, input_ids,
        )

    def _patchify_and_project(self, params, pixel_values: jax.Array):
        """[N, H, W, C] -> [N*gh*gw, ps*ps*C] -> projector (reference
        _patchify_and_project:205)."""
        vc = self.config.vision_config
        ps = vc.spatial_patch_size
        if pixel_values.ndim == 3:
            pixel_values = pixel_values[None]
        N, H, W, C = pixel_values.shape
        gh, gw = H // ps, W // ps
        patches = pixel_values.reshape(N, gh, ps, gw, ps, C)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(N * gh * gw, ps * ps * C
                                  * vc.temporal_patch_size)
        proj = params["language_model"]["model"]["img_projector"]
        return linear(proj, patches)

    # ---------------------------------------------------------- forward
    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm_params = params["language_model"]
        hidden, cache = self.language_model(
            lm_params, inputs_embeds, cache, position_ids)
        self._last_hidden = hidden  # read by the perception decode loop
        return self.language_model.logits(lm_params, hidden), cache

    # --------------------------------------------------- host-side plan
    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        """Collapsed positions + golden (h, w) coords + image block ids
        (reference _precompute_positions:168, compute_pos_hw:90,
        create_falcon_perception_mask:121)."""
        cfg = self.config
        ids = np.asarray(input_ids)
        B, S = ids.shape
        pos = np.zeros((B, S), np.int32)
        hw = np.zeros((B, S, 2), np.float32)
        blk = np.zeros((B, S), np.int32)
        deltas = np.zeros((B, 1), np.int32)

        grids: List = []
        if image_grid_thw is not None:
            g = np.asarray(image_grid_thw)
            # accept [N,3] (t,h,w) or [N,2] (h,w)
            grids = [tuple(int(x) for x in row[-2:]) for row in g]

        am = (np.asarray(attention_mask)
              if attention_mask is not None else np.ones((B, S), np.int64))
        gi = 0
        for b in range(B):
            start = int(np.argmax(am[b])) if am[b].any() else 0
            in_image = False
            nxt = 0
            n_blocks = 0
            img_count = 0
            coords: List = []
            for s in range(start, S):
                t = int(ids[b, s])
                if t == cfg.image_cls_token_id and not in_image:
                    in_image = True
                    n_blocks += 1
                    if gi < len(grids):
                        gh, gw = grids[gi]
                        gi += 1
                        rh = math.sqrt(gh / gw)
                        rw = math.sqrt(gw / gh)
                        for hi in range(gh):
                            for wi in range(gw):
                                coords.append((
                                    -rh + 2 * rh * hi / max(gh - 1, 1),
                                    -rw + 2 * rw * wi / max(gw - 1, 1)))
                pos[b, s] = nxt
                if in_image:
                    blk[b, s] = n_blocks
                    if t == cfg.img_id and img_count < len(coords):
                        hw[b, s] = coords[img_count]
                        img_count += 1
                else:
                    nxt += 1
                if t == cfg.img_end_id and in_image:
                    in_image = False
                    nxt += 1
            deltas[b, 0] = int(pos[b].max()) + 1 - S

        lm = self.language_model
        lm.pending_blk = blk
        lm.pending_hw = hw
        return np.broadcast_to(pos[None], (3, B, S)).copy(), deltas

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        return {}

    # -------------------------------------------------- perception heads
    def decode_coords(self, params, hidden: jax.Array) -> jax.Array:
        logits = bbox_decode(params["coord_decoder"], hidden)
        return logits.reshape(-1, 2, self.config.coord_out_dim // 2)

    def decode_sizes(self, params, hidden: jax.Array) -> jax.Array:
        logits = bbox_decode(params["size_decoder"], hidden)
        return logits.reshape(-1, 2, self.config.size_out_dim // 2)

    @staticmethod
    def process_sizes(logits: np.ndarray) -> np.ndarray:
        """Bin index -> log2-spaced size fraction (reference :305)."""
        num_bins = logits.shape[-1]
        pred = np.argmax(logits, axis=-1).astype(np.float32) / (num_bins - 1)
        min_size = math.log2(1.0 / num_bins)
        return 2.0 ** (pred * (0.0 - min_size) + min_size)

    def compute_segm_features(self, params, hidden, input_ids,
                              pixel_values, grid_h: int, grid_w: int):
        """Image-token hidden states -> conv_segm -> AnyUp high-res
        features (reference compute_segm_features:316)."""
        cfg = self.config
        ids = np.asarray(input_ids)[0]
        idx = np.nonzero(ids == cfg.img_id)[0]
        if idx.size != grid_h * grid_w:
            raise ValueError(
                f"image tokens ({idx.size}) != grid "
                f"({grid_h}x{grid_w}={grid_h * grid_w})")
        feats = jnp.take(hidden[0], jnp.asarray(idx), axis=0)
        feats = feats.reshape(1, grid_h, grid_w, -1)
        w = params["conv_segm"]["weight"].astype(feats.dtype)  # HWIO 3x3
        lr = jax.lax.conv_general_dilated(
            feats, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        lr = lr + params["conv_segm"]["bias"].astype(lr.dtype)
        if "itok_upsampler" not in params:
            return lr
        images = pixel_values
        if images.ndim == 3:
            images = images[None]
        _, H, W, _ = images.shape
        ps = cfg.vision_config.spatial_patch_size
        # pad to square multiples of ps so AnyUp sees training-like context
        max_dim = max(H, W)
        pad = ((max_dim + ps - 1) // ps) * ps
        if pad != H or pad != W:
            images = jnp.pad(images, ((0, 0), (0, pad - H),
                                      (0, pad - W), (0, 0)))
            lr = jnp.pad(lr, ((0, 0), (0, pad // ps - grid_h),
                              (0, pad // ps - grid_w), (0, 0)))
        hr = anyup(params["itok_upsampler"], images, lr)
        if pad != H or pad != W:
            hr = hr[:, :H, :W, :]
        return hr

    def decode_segm_mask(self, params, seg_hidden, segm_features,
                         orig_h: int, orig_w: int,
                         threshold: float = 0.5) -> np.ndarray:
        """Dot the projected seg token against the feature map
        (reference decode_segm_mask:411)."""
        cfg = self.config
        tok = segm_project(params["proj_segm"], seg_hidden,
                           cfg.num_segm_layers)
        logits = jnp.sum(segm_features[0] * tok[None, None, :], axis=-1)
        fh, fw = logits.shape
        if (fh, fw) != (orig_h, orig_w):
            logits = jax.image.resize(logits, (orig_h, orig_w), "bilinear")
        return np.asarray(jax.nn.sigmoid(logits) > threshold)

    # ------------------------------------------------ perception decode
    def generate_perception(self, processor, *, image, query: str,
                            max_new_tokens: int = 512,
                            segm_threshold: float = 0.5) -> List[Dict]:
        """Greedy detection loop with coord/size feedback embeddings
        (reference generate_perception:521).  Host-driven over one jitted
        step; returns [{'xy', 'hw', 'mask'?}, ...]."""
        from PIL import Image as PILImage

        cfg = self.config
        params = self.params
        if not isinstance(image, PILImage.Image):
            from ...utils.processing import load_image

            image = load_image(image)
        image = image.convert("RGB")

        out = processor(text=[query], images=[image], padding=False)
        input_ids = np.asarray(out["input_ids"])
        pixel_values = jnp.asarray(out["pixel_values"])
        grid_hw = np.asarray(out["image_grid_hw"])
        gh, gw = int(grid_hw[0, 0]), int(grid_hw[0, 1])
        orig_h = int(pixel_values.shape[-3])
        orig_w = int(pixel_values.shape[-2])

        pos, deltas = self.prepare_position_ids(input_ids, grid_hw)
        S = input_ids.shape[1]
        capacity = S + max_new_tokens + 8
        lm = self.language_model
        cache = lm.init_cache(1, capacity, jnp.bfloat16)

        embeds = jax.jit(self.get_input_embeddings)(
            params, jnp.asarray(input_ids), pixel_values)
        lm_params = params["language_model"]
        hidden, cache = lm(lm_params, embeds, cache, jnp.asarray(pos))
        logits = lm.logits(lm_params, hidden)[:, -1]

        segm_features = None
        if "proj_segm" in params:
            segm_features = self.compute_segm_features(
                params, hidden, input_ids, pixel_values, gh, gw)

        @jax.jit
        def step(params, cache, tok, coord_xy, size_hw, use_coord,
                 use_size, pos1):
            lmp = params["language_model"]
            e = lm.embed(lmp, tok[None, None])
            ce = fourier_encode(params["coord_encoder"],
                                coord_xy.reshape(1, 2)).reshape(1, 1, -1)
            se = fourier_encode(params["size_encoder"],
                                size_hw.reshape(1, 2)).reshape(1, 1, -1)
            e = jnp.where(use_coord, ce.astype(e.dtype), e)
            e = jnp.where(use_size, se.astype(e.dtype), e)
            position_ids = jnp.broadcast_to(pos1, (3, 1, 1))
            h, cache = lm(lmp, e, cache, position_ids)
            return lm.logits(lmp, h)[:, -1], h[:, -1, :], cache

        h_last = hidden[:, -1, :]
        detections: List[Dict] = []
        current: Dict = {}
        coord_xy = jnp.zeros((1, 2), jnp.float32)
        size_hw = jnp.zeros((1, 2), jnp.float32)
        delta = int(deltas[0, 0])

        for _ in range(max_new_tokens):
            tok = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
            if tok == cfg.eos_id:
                break
            use_coord = use_size = False
            if tok == cfg.coord_token_id:
                if "xy" in current and "hw" in current:
                    detections.append(current)
                    current = {}
                cl = np.asarray(self.decode_coords(params, h_last))
                nb = cl.shape[-1]
                bins = np.argmax(cl, axis=-1)
                px, py = bins[0, 0] / (nb - 1), bins[0, 1] / (nb - 1)
                coord_xy = jnp.asarray([[px, py]], jnp.float32)
                current["xy"] = {"x": float(px), "y": float(py)}
                use_coord = True
            elif tok == cfg.size_token_id:
                sl = np.asarray(self.decode_sizes(params, h_last))
                hw_pred = self.process_sizes(sl)
                size_hw = jnp.asarray(hw_pred[0:1], jnp.float32)
                current["hw"] = {"h": float(hw_pred[0, 0]),
                                 "w": float(hw_pred[0, 1])}
                use_size = True
            elif tok == cfg.seg_token_id:
                if segm_features is not None:
                    current["mask"] = self.decode_segm_mask(
                        params, h_last[0], segm_features, orig_h, orig_w,
                        segm_threshold)
                if "xy" in current and "hw" in current:
                    detections.append(current)
                current = {}
            pos1 = cache.offset + delta
            logits, h_last, cache = step(
                params, cache, jnp.asarray(tok, jnp.int32), coord_xy,
                size_hw, jnp.asarray(use_coord), jnp.asarray(use_size),
                pos1)

        if "xy" in current and "hw" in current:
            detections.append(current)
        return detections

    # ----------------------------------------------------------- layout
    @property
    def stack_patterns(self):
        return STACK_PATTERNS

    def sanitize(self, weights: dict) -> dict:
        """Raw llama-lab checkpoint keys -> canonical tree (reference
        sanitize:754).  Also converts torch conv layouts to HWIO and
        synthesizes identity norms/zero sinks when absent."""
        import re

        a = self.config.text_config
        out = {}
        anyup_w = anyup_b = None
        for k, v in weights.items():
            v = np.asarray(v)
            if k in ("language_model.model.cos_1d",
                     "language_model.model.sin_1d", "cos_1d", "sin_1d"):
                continue  # deterministic; computed in-module
            if k.startswith("itok_upsampler."):
                sfx = k[len("itok_upsampler."):]
                if sfx == "cross_decode.cross_attn.attention.in_proj_weight":
                    anyup_w = v
                    continue
                if sfx == "cross_decode.cross_attn.attention.in_proj_bias":
                    anyup_b = v
                    continue
                sfx = _remap_anyup_key(sfx)
                if sfx is None:
                    continue
                if v.ndim == 4 and "norm" not in sfx:
                    # torch OIHW (basis O1KK included) -> HWIO
                    v = v.transpose(2, 3, 1, 0)
                out["itok_upsampler." + sfx] = v
                continue
            k = k.replace("tok_embeddings.",
                          "language_model.model.embed_tokens.", 1) \
                if k.startswith("tok_embeddings.") else k
            if k.startswith("img_projector."):
                k = "language_model.model." + k
            elif k.startswith("norm."):
                k = "language_model.model." + k
            elif k.startswith("output."):
                k = k.replace("output.", "language_model.lm_head.", 1)
            elif k == "freqs_cis_golden":
                k = "language_model.model.freqs_cis_golden"
            elif k.startswith("layers."):
                k = "language_model.model." + k
            if ".attention." in k:
                k = k.replace(".attention.", ".self_attn.")
            if ".feed_forward." in k:
                k = k.replace(".feed_forward.", ".mlp.")
            # norm aliases -> canonical names
            k = k.replace(".self_attn._norm_w_in", ".self_attn.norm_in.weight")
            k = k.replace(".self_attn._norm_w_qk", ".self_attn.qk_norm.weight")
            k = k.replace(".attention_norm.weight",
                          ".self_attn.norm_in.weight")
            k = k.replace(".mlp._norm_w", ".mlp.norm.weight")
            k = k.replace(".ffn_norm.weight", ".mlp.norm.weight")
            if ".w13." in k and k.endswith("weight"):
                # released checkpoints interleave gate/up rows
                v = np.concatenate([v[0::2], v[1::2]], axis=0)
            if k.endswith("conv_segm.weight") and v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            # proj_segm.layers.N / pixel_layer stay as-is
            m = re.match(r"proj_segm\.layers\.(\d+)\.(.+)", k)
            if m:
                k = f"proj_segm.layers.{m.group(1)}.{m.group(2)}"
            out[k] = v
        if anyup_w is not None:
            wq, wk, _ = np.split(anyup_w, 3, axis=0)
            out["itok_upsampler.cross_decode.cross_attn.q_proj.weight"] = wq
            out["itok_upsampler.cross_decode.cross_attn.k_proj.weight"] = wk
        if anyup_b is not None:
            bq, bk, _ = np.split(anyup_b, 3, axis=0)
            out["itok_upsampler.cross_decode.cross_attn.q_proj.bias"] = bq
            out["itok_upsampler.cross_decode.cross_attn.k_proj.bias"] = bk
        # synthesize missing per-layer identities so the stack scans
        for i in range(a.num_hidden_layers):
            p = f"language_model.model.layers.{i}."
            out.setdefault(p + "self_attn.norm_in.weight",
                           np.ones(a.hidden_size, np.float32))
            out.setdefault(p + "self_attn.qk_norm.weight",
                           np.ones(a.head_dim, np.float32))
            out.setdefault(p + "self_attn.sinks",
                           np.zeros(a.num_attention_heads, np.float32))
            out.setdefault(p + "mlp.norm.weight",
                           np.ones(a.hidden_size, np.float32))
        out.setdefault(
            "language_model.model.freqs_cis_golden",
            np.zeros((a.num_attention_heads, a.head_dim // 4, 2),
                     np.float32))
        return out


def _remap_anyup_key(suffix: str) -> Optional[str]:
    """Torch Sequential indices -> named AnyUp tree (reference
    _remap_anyup_key:683)."""
    import re

    BLOCK_MAP = {
        "0.weight": "norm1.weight", "0.bias": "norm1.bias",
        "2.weight": "conv1.weight",
        "3.weight": "norm2.weight", "3.bias": "norm2.bias",
        "5.weight": "conv2.weight",
    }
    for enc in ("image_encoder", "key_encoder", "query_encoder",
                "aggregation"):
        if not suffix.startswith(enc + "."):
            continue
        rest = suffix[len(enc) + 1:]
        if rest == "0.weight":
            return enc + ".conv.weight"
        m = re.match(r"(\d+)\.block\.(.+)", rest)
        if m and m.group(2) in BLOCK_MAP:
            return f"{enc}.blocks.{int(m.group(1)) - 1}.{BLOCK_MAP[m.group(2)]}"
        m = re.match(r"(\d+)\.shortcut\.weight", rest)
        if m:
            return f"{enc}.blocks.{int(m.group(1)) - 1}.shortcut.weight"
        return None
    if suffix.startswith("key_features_encoder."):
        rest = suffix[len("key_features_encoder."):]
        if rest == "0.basis":
            return "key_features_encoder.lfu.basis"
        m = re.match(r"(\d+)\.block\.(.+)", rest)
        if m and m.group(2) in BLOCK_MAP:
            return ("key_features_encoder.blocks."
                    f"{int(m.group(1)) - 1}.{BLOCK_MAP[m.group(2)]}")
        return None
    if suffix == "cross_decode.conv2d.weight":
        return "cross_decode.conv.weight"
    if suffix in ("cross_decode.cross_attn.norm_q.weight",
                  "cross_decode.cross_attn.norm_k.weight",
                  "rope.freqs"):
        return suffix
    return None
