"""Qwen3-Omni-MoE (thinker): audio + vision + MoE text.

Role parity: reference mlx_vlm/models/qwen3_omni_moe — thinker.py (audio /
image / video feature merge:135-289), qwen3_omni_moe.py (sanitize
composition:61-70).  The talker / code2wav speech-output stack is not yet
implemented; text generation from audio+vision input is (the reference's
default path when enable_audio_output=False).

TPU design: reuses the qwen3_vl deepstack vision tower and the qwen3_vl_moe
decoder verbatim; the audio tower contributes features scattered at
audio_token_id positions through the same vectorized merge.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..qwen2_vl.qwen2_vl import merge_input_ids_with_image_features
from ..qwen3_vl.vision import VisionModel
from ..qwen3_vl_moe.qwen3_vl_moe import MoELanguageModel
from .audio import AudioModel, audio_chunk_plan, chunk_mel_features
from .config import AudioConfig, ModelConfig, TextConfig, VisionConfig  # noqa: F401

STACK_PATTERNS = (
    "language_model.model.layers",
    "vision_tower.blocks",
    "audio_tower.layers",
)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.vision_tower = VisionModel(config.vision_config)
        self.audio_tower = AudioModel(config.audio_config)
        self.language_model = MoELanguageModel(config.text_config, config)
        self.talker = None
        self.code2wav = None
        if config.enable_audio_output and config.talker_config is not None:
            from .code2wav import Code2Wav
            from .talker import Talker

            self.talker = Talker(config.talker_config)
            if config.code2wav_config is not None:
                self.code2wav = Code2Wav(config.code2wav_config)

    def vision_features(self, params, pixel_values, rotary_freqs, segment_ids,
                        pos_idx, pos_weights):
        return self.vision_tower(
            params["vision_tower"], pixel_values, rotary_freqs, segment_ids,
            pos_idx, pos_weights,
        )

    def audio_features(self, params, audio_chunks, audio_gather_idx,
                       audio_segment_ids):
        return self.audio_tower(
            params["audio_tower"], audio_chunks, audio_gather_idx,
            audio_segment_ids,
        )

    def get_input_embeddings(
        self,
        params: dict,
        input_ids: jax.Array,
        pixel_values: Optional[jax.Array] = None,
        rotary_freqs: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        pos_idx: Optional[jax.Array] = None,
        pos_weights: Optional[jax.Array] = None,
        audio_chunks: Optional[jax.Array] = None,
        audio_gather_idx: Optional[jax.Array] = None,
        audio_segment_ids: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
    ) -> jax.Array:
        embeds = self.language_model.embed(params["language_model"], input_ids)
        cfg = self.config
        merged = embeds
        ds = None
        if image_features is not None or pixel_values is not None:
            if image_features is not None:
                feats, ds = image_features, None
            else:
                feats, ds = self.vision_features(
                    params, pixel_values, rotary_freqs, segment_ids,
                    pos_idx, pos_weights,
                )
            merged = merge_input_ids_with_image_features(
                cfg.image_token_id, cfg.video_token_id, feats, merged, input_ids
            )
        if audio_chunks is not None:
            afeats = self.audio_features(
                params, audio_chunks.astype(embeds.dtype),
                audio_gather_idx, audio_segment_ids,
            )
            merged = merge_input_ids_with_image_features(
                cfg.audio_token_id, -1, afeats, merged, input_ids
            )
        if ds is None:
            return merged
        zeros = jnp.zeros_like(embeds)
        packed = [merged]
        for i in range(ds.shape[0]):
            packed.append(
                merge_input_ids_with_image_features(
                    cfg.image_token_id, cfg.video_token_id, ds[i], zeros,
                    input_ids,
                )
            )
        return jnp.concatenate(packed, axis=-1)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    # ----------------------------------------------------------------- host
    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        from ..qwen2_vl.language import mrope_position_ids

        return mrope_position_ids(
            input_ids, image_grid_thw, video_grid_thw, attention_mask,
            merge=self.config.vision_config.spatial_merge_size,
            image_token_id=self.config.image_token_id,
            video_token_id=self.config.video_token_id,
        )

    def vision_aux_inputs(self, grid_thw: np.ndarray) -> dict:
        return self.vision_tower.aux_inputs(grid_thw)

    def audio_aux_inputs(self, input_features, feature_lens: List[int]) -> dict:
        """Host-side chunking + window plan for the audio tower."""
        cfg = self.config.audio_config
        gather, segs, _ = audio_chunk_plan(feature_lens, cfg)
        return {
            "audio_chunks": chunk_mel_features(input_features, feature_lens, cfg),
            "audio_gather_idx": gather,
            "audio_segment_ids": segs,
        }

    def sanitize(self, weights: dict) -> dict:
        def transform(key: str) -> str:
            if key.startswith("thinker."):
                key = key[len("thinker."):]
            if key.startswith("model.") or key.startswith("lm_head"):
                # thinker.model.* is the text stack
                if key.startswith("model."):
                    key = "language_model." + key
                else:
                    key = "language_model." + key
            if key.startswith("visual."):
                key = "vision_tower." + key[len("visual."):]
                key = (key.replace("merger.ln_q", "merger.norm")
                       .replace("merger.mlp.0", "merger.linear_fc1")
                       .replace("merger.mlp.2", "merger.linear_fc2"))
            return key

        speech = {k: v for k, v in weights.items()
                  if k.startswith(("talker.", "code2wav.", "token2wav."))}
        weights = {
            transform(k): v for k, v in weights.items()
            if not k.startswith(("talker.", "code2wav", "token2wav"))
        }
        if self.talker is not None and speech:
            weights.update(self._sanitize_speech(speech))
        from ..qwen3_vl_moe.qwen3_vl_moe import Model as _MoE

        weights = _MoE.sanitize(weights)
        at = {k: v for k, v in weights.items() if k.startswith("audio_tower.")}
        at = AudioModel.sanitize(at)
        weights = {k: v for k, v in weights.items()
                   if not k.startswith("audio_tower.")}
        weights.update(at)
        return weights

    def _sanitize_speech(self, speech: dict) -> dict:
        """Talker/code2wav key translation (reference talker.py sanitize +
        code2wav.py sanitize: expert stacking, conv layout)."""
        import re

        tcfg = self.config.talker_config
        out = {}
        # ---- talker MoE experts -> stacked [E, ...]
        n_exp = tcfg.text_config.num_experts
        n_layers = tcfg.text_config.num_hidden_layers
        grabbed = set()
        for li in range(n_layers):
            for n in ("gate_proj", "up_proj", "down_proj"):
                ws = []
                for e in range(n_exp):
                    k = f"talker.model.layers.{li}.mlp.experts.{e}.{n}.weight"
                    if k in speech:
                        ws.append(speech[k])
                        grabbed.add(k)
                if ws:
                    out[
                        "talker.language_model.model.layers."
                        f"{li}.mlp.experts.{n}.weight"
                    ] = np.stack([np.asarray(w) for w in ws], axis=0)
        # ---- code-predictor per-group embeddings/heads -> stacked
        G = tcfg.num_code_groups
        embs, heads = [], []
        for j in range(G - 1):
            ek = f"talker.code_predictor.model.codec_embedding.{j}.weight"
            hk = f"talker.code_predictor.lm_head.{j}.weight"
            if ek in speech:
                embs.append(speech[ek])
                grabbed.add(ek)
            if hk in speech:
                heads.append(speech[hk])
                grabbed.add(hk)
        if embs:
            out["talker.cp_embeds"] = np.stack(
                [np.asarray(e) for e in embs], axis=0)
        if heads:
            out["talker.cp_heads"] = np.stack(
                [np.asarray(h) for h in heads], axis=0)

        for k, v in speech.items():
            if k in grabbed:
                continue
            nk = k
            if nk.startswith("talker.model.codec_embedding"):
                nk = nk.replace("talker.model.codec_embedding",
                                "talker.codec_embedding")
            elif nk.startswith("talker.model."):
                nk = nk.replace("talker.model.",
                                "talker.language_model.model.", 1)
            if nk.startswith("code2wav.") and nk.endswith(".conv.weight") \
                    and getattr(v, "ndim", 0) == 3:
                # regular Conv1d (out,in,k) -> WIO (k,in,out); transposed
                # convs (upsample.*.0 / decoder block index 1) keep torch
                # (in,out,k) for the dilated-conv lowering
                is_convt = bool(
                    re.search(r"upsample\.\d+\.0\.conv\.weight$", nk)
                    or re.search(r"decoder\.\d+\.block\.1\.conv\.weight$",
                                 nk))
                if not is_convt:
                    v = np.asarray(v).transpose(2, 1, 0)
            out[nk] = v
        return out

    # ---------------------------------------------------------------- speech
    def generate_speech(self, text: str, voice: str = "", speed: float = 1.0,
                        processor=None, input_ids=None,
                        max_new_tokens: int = 2048,
                        temperature: float = 0.9, top_p: float = 1.0,
                        seed: int = 0):
        """Text -> (waveform float32 [T], sample_rate) via talker + code2wav
        (reference qwen3_omni_moe.py generate + /v1/audio/speech route).

        Builds the talker's assistant segment from thinker EMBEDDINGS of
        the given text (the reference's _get_talker_assistant_parts uses
        embeddings, not hidden states, for assistant text)."""
        if self.talker is None:
            raise ValueError("model has no talker (enable_audio_output)")
        cfg = self.config
        tcfg = cfg.talker_config
        if input_ids is None:
            tok = getattr(processor, "tokenizer", processor)
            if tok is None:
                raise ValueError("generate_speech needs a processor or ids")
            ids = tok.encode(f"<|im_start|>assistant\n{text}<|im_end|>")
            input_ids = np.asarray(ids, np.int32)[None]
        ids = jnp.asarray(input_ids, jnp.int32)
        if ids.shape[1] < 5:
            raise ValueError("speech segment too short")
        tp = self.params["talker"]
        from .talker import resize_mlp

        thinker_embed = self.language_model.embed(
            self.params["language_model"], ids)
        assistant_hidden = resize_mlp(tp["text_projection"], thinker_embed)

        specials = jnp.asarray(
            [[cfg.tts_bos_token_id, cfg.tts_eos_token_id,
              cfg.tts_pad_token_id]], jnp.int32)
        sp = resize_mlp(
            tp["text_projection"],
            self.language_model.embed(self.params["language_model"],
                                      specials))
        tts_bos, tts_eos, tts_pad = sp[:, 0:1], sp[:, 1:2], sp[:, 2:3]

        assistant_text_hidden = jnp.concatenate([
            assistant_hidden[:, :3],
            jnp.broadcast_to(tts_pad, (1, 4, tts_pad.shape[-1])),
            tts_bos,
            assistant_hidden[:, 3:4],
        ], axis=1)
        speaker_id = tcfg.speaker_id.get(
            (voice or "ethan").lower(),
            next(iter(tcfg.speaker_id.values())))
        codec_specials = jnp.asarray([[
            tcfg.codec_nothink_id, tcfg.codec_think_bos_id,
            tcfg.codec_think_eos_id, speaker_id, tcfg.codec_pad_id,
            tcfg.codec_bos_id,
        ]], jnp.int32)
        codec_hidden = jnp.concatenate([
            jnp.zeros((1, 3, assistant_hidden.shape[-1]),
                      assistant_hidden.dtype),
            tp["codec_embedding"]["weight"][codec_specials[0]][None],
        ], axis=1)
        trailing = jnp.concatenate(
            [assistant_hidden[:, 4:], tts_eos], axis=1)

        codes = self.talker.generate_codes(
            tp, assistant_text_hidden + codec_hidden, trailing, tts_pad,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, seed=seed)

        if self.code2wav is None:
            raise ValueError("model has no code2wav vocoder")
        wav = self.code2wav.chunked_decode(self.params["code2wav"], codes)
        up = self.code2wav.upsample_factor()
        sample_rate = int(up * 12.5)   # codec frames at 12.5 Hz
        wav = np.asarray(wav[0], np.float32)
        if speed and speed != 1.0 and wav.size:
            n = max(1, int(round(wav.size / speed)))
            wav = np.interp(
                np.linspace(0, wav.size - 1, n),
                np.arange(wav.size), wav).astype(np.float32)
        return wav, sample_rate

    @property
    def stack_patterns(self):
        pats = STACK_PATTERNS
        if self.talker is not None:
            # code2wav.pre_transformer.layers stays unstacked (8 unrolled
            # heterogeneously-consumed layers in the vocoder)
            pats = pats + (
                "talker.language_model.model.layers",
                "talker.code_predictor.model.layers",
            )
        return pats
