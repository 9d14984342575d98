"""MiniCPM-o 2.6 (vision + audio omni) family.

Role parity: reference mlx_vlm/models/minicpmo — the MiniCPM-V 2.6
stack: navit-style SigLIP (bucketed per-grid position ids) whose
features a 64-query Resampler compresses via ONE cross-attention with
2-D sin/cos position encodings added to the keys (minicpmo.py:124), a
learned output projection, a Whisper-style audio encoder (conv k3 s1 +
conv k3 s2, sinusoidal positions, pre-LN attention blocks) with a
2-layer ReLU AudioProjector over 4x frame pooling (audio.py:110-175),
and a qwen2 decoder.  Image features replace <unk> spans; audio
features replace <audio> spans.

TPU design: the SigLIP tower and bucketed position planning are shared
with minicpmv4_6; the resampler's sincos table is a host-side constant
sliced per grid; the audio conv stack is two dense [K, Cin, Cout]
contractions over static frame counts; the decoder is the shared llama
scan.  The fused resampler.attn.in_proj checkpoint tensor splits to
q/k/v at sanitize (reference sanitize:526).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import layer_norm, linear
from ...ops.attention import sdpa
from ..llama.config import TextConfig as _LlamaText
from ..llama.language import LanguageModel as _LlamaLM
from ..llama.llama import text_position_ids
from ..minicpmv4_6 import SiglipTower, position_bucket_ids
from ..minicpmv4_6 import VisionConfig as _V46Config
from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features


@dataclass
class AudioConfig(BaseModelConfig):
    model_type: str = "whisper"
    num_mel_bins: int = 80
    d_model: int = 1024
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5


@dataclass
class VisionConfig(_V46Config):
    model_type: str = "siglip_vision_model"


@dataclass
class TextConfig(_LlamaText):
    model_type: str = "qwen2"


@dataclass
class ModelConfig(BaseModelConfig):
    text_config: TextConfig = None
    vision_config: VisionConfig = None
    audio_config: Optional[AudioConfig] = None
    model_type: str = "minicpmo"
    image_token_id: int = 0      # processor's <unk> fill token
    audio_token_id: Optional[int] = None
    query_num: int = 64
    init_audio: bool = True
    audio_pool_step: int = 2
    eos_token_id: Optional[Union[int, List[int]]] = None

    @classmethod
    def from_dict(cls, params: dict):
        params = dict(params)
        params["text_config"] = TextConfig.from_dict(
            params.get("text_config", {}) or {})
        params["vision_config"] = VisionConfig.from_dict(
            params.get("vision_config", {}) or {})
        ac = params.get("audio_config")
        params["audio_config"] = AudioConfig.from_dict(ac) if ac else None
        allowed = inspect.signature(cls).parameters
        return cls(**{k: v for k, v in params.items() if k in allowed})


def sincos_2d(h: int, w: int, dim: int) -> np.ndarray:
    """[h, w, dim] 2-D sin/cos table (reference minicpmo.py:43-73)."""
    def one(d, pos):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float32)
                                / (d / 2.0))
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return np.concatenate([one(dim // 2, gh), one(dim // 2, gw)], axis=-1)


class LanguageModel(_LlamaLM):
    pass


class Model:
    CONFIG_CLS = ModelConfig

    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config.text_config, config)
        self.vision_tower = SiglipTower(config.vision_config)
        self._grid = (1, 1)

    # ---------------------------------------------------------- resampler
    def _resample(self, params, feats, grid):
        """feats [1, N, E_vis] + (h, w) -> [1, Q, D] via one cross-attn."""
        rp = params["resampler"]
        D = self.config.text_config.hidden_size
        nh = max(1, D // 128)
        hd = D // nh
        h, w = grid
        x = feats
        if "kv_proj" in rp:
            x = linear(rp["kv_proj"], x)
        x = layer_norm(rp["ln_kv"], x, 1e-6)
        pos = jnp.asarray(sincos_2d(h, w, D).reshape(1, h * w, D), x.dtype)
        q = layer_norm(rp["ln_q"], rp["query"], 1e-6)[None]  # [1, Q, D]
        B, Q, _ = q.shape
        a = rp["attn"]
        qh = linear(a["q_proj"], q).reshape(B, Q, nh, hd).transpose(0, 2, 1, 3)
        kh = linear(a["k_proj"], x + pos).reshape(B, -1, nh, hd
                                                  ).transpose(0, 2, 1, 3)
        vh = linear(a["v_proj"], x).reshape(B, -1, nh, hd
                                            ).transpose(0, 2, 1, 3)
        out = sdpa(qh, kh, vh, hd**-0.5, None)
        out = linear(a["out_proj"],
                     out.transpose(0, 2, 1, 3).reshape(B, Q, -1))
        out = layer_norm(rp["ln_post"], out, 1e-6)
        return out @ rp["proj"].astype(out.dtype)

    # -------------------------------------------------------------- audio
    def audio_features(self, params, audio_features):
        """[B, n_mels, T] log-mel -> [B, T//2//pool, D_llm] (reference
        audio.py AudioModel + 4x pooling + AudioProjector)."""
        a = self.config.audio_config
        ap = params["audio_tower"]
        x = audio_features.transpose(0, 2, 1)  # [B, T, mels]

        def conv1d(p, x, stride):
            w = p["weight"]  # [Cout, Cin, K] checkpoint layout
            wk = jnp.transpose(w, (2, 1, 0))  # [K, Cin, Cout]
            y = jax.lax.conv_general_dilated(
                x[:, :, :], wk, (stride,), [(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"))
            return y + p["bias"]

        x = jax.nn.gelu(conv1d(ap["conv1"], x, 1), approximate=False)
        x = jax.nn.gelu(conv1d(ap["conv2"], x, 2), approximate=False)
        T = x.shape[1]
        x = x + ap["embed_positions"]["weight"][None, :T]
        eps = a.layer_norm_eps
        nh = a.encoder_attention_heads
        hd = a.d_model // nh
        for i in range(a.encoder_layers):
            lp = ap["layers"][str(i)]
            y = layer_norm(lp["self_attn_layer_norm"], x, eps)
            sa = lp["self_attn"]
            B, S, _ = y.shape
            q = linear(sa["q_proj"], y).reshape(B, S, nh, hd
                                                ).transpose(0, 2, 1, 3)
            k = linear(sa["k_proj"], y).reshape(B, S, nh, hd
                                                ).transpose(0, 2, 1, 3)
            v = linear(sa["v_proj"], y).reshape(B, S, nh, hd
                                                ).transpose(0, 2, 1, 3)
            o = sdpa(q, k, v, hd**-0.5, None)
            x = x + linear(sa["out_proj"],
                           o.transpose(0, 2, 1, 3).reshape(B, S, -1))
            y = layer_norm(lp["final_layer_norm"], x, eps)
            y = jax.nn.gelu(linear(lp["fc1"], y), approximate=False)
            x = x + linear(lp["fc2"], y)
        x = layer_norm(ap["layer_norm"], x, eps)
        # 2-layer ReLU projector, then mean-pool kernel=stride=pool_step
        # (reference get_audio_embedding:338-352)
        pj = params["audio_projection_layer"]
        y = jax.nn.relu(linear(pj["linear1"], x))
        y = linear(pj["linear2"], y)
        pool = max(int(self.config.audio_pool_step), 1)
        T2 = ((y.shape[1] - pool) // pool + 1) * pool
        y = y[:, :T2].reshape(y.shape[0], T2 // pool, pool, y.shape[-1])
        return y.mean(axis=2)

    # -------------------------------------------------------------- model
    def vision_aux_inputs(self, grid_thw):
        cfg = self.config.vision_config
        g = np.asarray(grid_thw)[0]
        h, w = int(g[-2]), int(g[-1])
        self._grid = (h, w)
        side = cfg.image_size // cfg.patch_size
        return {"pos_ids": position_bucket_ids(h, w, side)}

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             pos_ids=None, audio_features=None,
                             image_features=None, **aux):
        embeds = self.language_model.embed(params["language_model"],
                                           input_ids)
        if pixel_values is not None or image_features is not None:
            if image_features is None:
                px = pixel_values
                if px.ndim == 4 and px.shape[1] in (1, 3):
                    px = px.transpose(0, 2, 3, 1)
                feats = self.vision_tower(params["vision_tower"], px,
                                          pos_ids)
                image_features = self._resample(params, feats, self._grid)
            embeds = merge_input_ids_with_image_features(
                self.config.image_token_id, -1,
                image_features.reshape(-1, image_features.shape[-1]),
                embeds, input_ids)
        if audio_features is not None and self.config.audio_token_id \
                is not None:
            af = self.audio_features(params, audio_features)
            embeds = merge_input_ids_with_image_features(
                self.config.audio_token_id, -1,
                af.reshape(-1, af.shape[-1]), embeds, input_ids)
        return embeds

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        if image_grid_thw is not None:
            g = np.asarray(image_grid_thw)[0]
            self._grid = (int(g[-2]), int(g[-1]))
        return text_position_ids(input_ids, attention_mask)

    def sanitize(self, weights: dict) -> dict:
        D = self.config.text_config.hidden_size
        out = {}
        for k, v in weights.items():
            if "position_ids" in k or "rotary_emb.inv_freq" in k:
                continue
            if k == "resampler.attn.in_proj_weight":
                out["resampler.attn.q_proj.weight"] = v[:D]
                out["resampler.attn.k_proj.weight"] = v[D:2 * D]
                out["resampler.attn.v_proj.weight"] = v[2 * D:]
                continue
            if k == "resampler.attn.in_proj_bias":
                out["resampler.attn.q_proj.bias"] = v[:D]
                out["resampler.attn.k_proj.bias"] = v[D:2 * D]
                out["resampler.attn.v_proj.bias"] = v[2 * D:]
                continue
            if k.startswith("vpm."):
                k = "vision_tower." + k[len("vpm."):]
            if k.startswith("apm."):
                k = "audio_tower." + k[len("apm."):]
            if k.startswith("llm."):
                k = "language_model." + k[len("llm."):]
            if k.startswith(("model.", "lm_head.")):
                k = "language_model." + k
            if (k == "vision_tower.embeddings.patch_embedding.weight"
                    and getattr(v, "ndim", 0) == 4):
                v = np.transpose(np.asarray(v), (2, 3, 1, 0))  # OIHW->HWIO
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",
                "vision_tower.encoder.layers")


__all__ = ["Model", "ModelConfig", "TextConfig", "VisionConfig",
           "AudioConfig", "LanguageModel"]
