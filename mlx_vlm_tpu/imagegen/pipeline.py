"""Flux2 text-to-image / image-edit pipeline.

Role parity: reference mlx_vlm/models/flux2/pipeline.py (Flux2Image /
Flux2ImageEdit: prompt encode -> flow-match Euler denoise w/ optional CFG ->
packed-latent VAE decode) and prompt.py (seq-len buckets).

TPU design:
- One jitted denoise step per (resolution, text bucket): the DiT forward,
  classifier-free guidance mix and the Euler update are a single compiled
  program; the Python loop over steps re-invokes it with scalar t/dt device
  arrays, so there is exactly one compile for any step count.
- CFG batches cond/uncond rows through ONE forward ([2, ...] batch) instead
  of the reference's two sequential transformer calls — the MXU sees a
  2x-larger matmul rather than two launches.  The negative prompt is
  encoded at the positive prompt's bucket so the rows share shapes.
- Rope tables are host-precomputed per (resolution, bucket) and stay
  resident on device; the text encoder and VAE decode are jitted once per
  bucket/resolution respectively.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .dit import DiT, DiTConfig, pos_rope
from .latent import (grid_ids, pack, patchify, prepare_packed_latents,
                     text_ids, unpack)
from .params import (Flux2Variant, get_variant, infer_variant,
                     load_text_encoder_params, load_transformer_params,
                     load_vae_params)
from .scheduler import FlowMatchEulerScheduler
from .text_encoder import TextEncoderConfig, encode_text
from .vae import VAEConfig, bn_normalize, decode_packed_latents, vae_encode

__all__ = ["Flux2Pipeline", "validate_dimensions", "DEFAULT_SEQ_LEN_BUCKETS"]

DEFAULT_SEQ_LEN_BUCKETS: Tuple[int, ...] = (32, 64, 128, 256, 512)


def validate_dimensions(*, width: int, height: int) -> None:
    """Reference config.py:validate_dimensions — [256, 2048], /16."""
    for label, value in (("width", width), ("height", height)):
        if value < 256 or value > 2048:
            raise ValueError(f"{label} must be in [256, 2048], got {value}")
        if value % 16:
            raise ValueError(f"{label} must be a multiple of 16, got {value}")


def pick_bucket(true_len: int, cap: int,
                buckets: Tuple[int, ...] = DEFAULT_SEQ_LEN_BUCKETS) -> int:
    """Reference prompt.py:_pick_bucket."""
    for b in sorted(b for b in buckets if b <= cap):
        if b >= true_len:
            return b
    return cap


class Flux2Pipeline:
    """Text-to-image generation and editing on a Flux2-class MMDiT.

    Everything heavy is jitted and cached by static shape; the instance
    holds only parameter pytrees and compiled callables.
    """

    def __init__(
        self,
        dit_params: dict,
        dit_config: DiTConfig,
        vae_params: dict,
        vae_config: Optional[VAEConfig] = None,
        text_params: Optional[dict] = None,
        text_config: Optional[TextEncoderConfig] = None,
        tokenizer=None,
        variant: Optional[Flux2Variant] = None,
        max_sequence_length: int = 512,
    ):
        self.dit = DiT(dit_config)
        self.dit_params = dit_params
        self.vae_params = vae_params
        self.vae_config = vae_config or VAEConfig()
        self.text_params = text_params
        self.text_config = text_config
        self.tokenizer = tokenizer
        self.variant = variant
        self.max_sequence_length = max_sequence_length
        self._prompt_cache: dict = {}
        self._dtype = dit_params["x_embedder"]["weight"].dtype

        cfg = self.dit.config

        @functools.partial(jax.jit, static_argnames=("n_gen",))
        def _step(params, latents, embeds, cos, sin, t, dt, guidance, n_gen):
            # latents [R, N_img, C] where R=2 for CFG (row 0 cond, row 1
            # uncond), embeds [R, S, joint]; returns updated [R, N, C].
            B = latents.shape[0]
            embeds = embeds.astype(latents.dtype)
            tvec = jnp.full((B,), t, latents.dtype)
            n_txt = embeds.shape[1]
            noise = self.dit(
                params, latents, embeds, tvec,
                rope_img=(cos[n_txt:], sin[n_txt:]),
                rope_txt=(cos[:n_txt], sin[:n_txt]),
            )
            if B == 2:
                cond, uncond = noise[:1], noise[1:]
                noise = uncond + guidance * (cond - uncond)
                latents = latents[:1]
            # Euler update only on the generated tokens; reference tokens
            # (edit mode) ride along unchanged.
            upd = latents[:, :n_gen] + dt * noise[:, :n_gen].astype(latents.dtype)
            return jnp.concatenate([upd, latents[:, n_gen:]], axis=1)

        self._step = _step
        self._decode = jax.jit(
            lambda p, packed: decode_packed_latents(p, packed, self.vae_config))
        self._encode_text = None
        if text_params is not None and text_config is not None:
            self._encode_text = jax.jit(
                functools.partial(encode_text, config=text_config))
        _ = cfg

    # ------------------------------------------------------------- loading
    @classmethod
    def from_pretrained(cls, model_path, variant=None, dtype=jnp.bfloat16,
                        include_encoder: bool = False,
                        max_sequence_length: int = 512) -> "Flux2Pipeline":
        """Load from the reference checkpoint layout: model_path/
        {transformer,vae,text_encoder,tokenizer}/ (weights.py parity)."""
        root = Path(model_path).expanduser()
        var = get_variant(variant) if variant else infer_variant(root)
        dit_params, dit_cfg = load_transformer_params(root, var, dtype)
        vae_params, vae_cfg = load_vae_params(
            root, include_encoder=include_encoder or var.supports_edit,
            dtype=dtype)
        text_params = text_cfg = tokenizer = None
        if (root / "text_encoder").exists():
            text_params, text_cfg = load_text_encoder_params(root, var, dtype)
        tok_dir = root / "tokenizer"
        if tok_dir.exists():
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                str(tok_dir), local_files_only=True, use_fast=True)
        return cls(dit_params, dit_cfg, vae_params, vae_cfg, text_params,
                   text_cfg, tokenizer, var,
                   max_sequence_length=max_sequence_length)

    # ------------------------------------------------------------ prompts
    def _format_prompt(self, prompt: str) -> str:
        """Chat-template wrap (reference tokenizer.py:_format_prompts)."""
        return self.tokenizer.apply_chat_template(
            [{"role": "user", "content": prompt}], tokenize=False,
            add_generation_prompt=True, enable_thinking=False)

    def encode_prompt(self, prompt: str, *, max_sequence_length=None,
                      bucket: Optional[int] = None) -> jax.Array:
        """[1, S_bucket, 3*hidden] prompt embeddings (reference
        prompt.py:encode_prompt; layers (9, 18, 27))."""
        if self.tokenizer is None or self._encode_text is None:
            raise RuntimeError("pipeline was loaded without a text encoder")
        cap = max_sequence_length or self.max_sequence_length
        key = (prompt, cap, bucket)
        if key in self._prompt_cache:
            return self._prompt_cache[key]
        text = self._format_prompt(prompt)
        true_len = len(self.tokenizer(text, add_special_tokens=True)["input_ids"])
        eff = bucket or pick_bucket(true_len, cap)
        toks = self.tokenizer(text, padding="max_length", max_length=eff,
                              truncation=True, add_special_tokens=True,
                              return_tensors="np")
        embeds = self._encode_text(
            self.text_params,
            input_ids=jnp.asarray(toks["input_ids"], jnp.int32),
            attention_mask=jnp.asarray(toks["attention_mask"], jnp.int32))
        self._prompt_cache[key] = embeds
        return embeds

    # ----------------------------------------------------------- generate
    def generate(self, prompt: Optional[str] = None, *, seed: int = 42,
                 steps: int = 4, width: int = 1024, height: int = 1024,
                 guidance: float = 1.0, max_sequence_length=None,
                 prompt_embeds: Optional[jax.Array] = None,
                 negative_prompt: str = " ") -> np.ndarray:
        """Text -> uint8 RGB [H, W, 3] (reference Flux2Image.generate_array)."""
        validate_dimensions(width=width, height=height)
        if steps < 1:
            raise ValueError(f"steps must be >= 1, got {steps}")
        embeds = self._resolve_embeds(prompt, prompt_embeds,
                                      max_sequence_length, guidance,
                                      negative_prompt)
        latents, ids, lh, lw = prepare_packed_latents(
            jax.random.PRNGKey(seed), height=height, width=width,
            num_latent_channels=self.vae_config.latent_channels,
            dtype=self._dtype)
        cos, sin = self._rope(embeds.shape[1], ids)
        latents = self._denoise(latents, embeds, cos, sin,
                                image_seq_len=lh * lw, steps=steps,
                                guidance=guidance, n_gen=lh * lw)
        return self._finish(latents[:, :lh * lw], lh, lw)

    def edit(self, prompt: Optional[str] = None,
             images: Sequence[np.ndarray] = (), *, seed: int = 42,
             steps: int = 4, width: Optional[int] = None,
             height: Optional[int] = None, guidance: float = 1.0,
             max_sequence_length=None,
             prompt_embeds: Optional[jax.Array] = None,
             negative_prompt: str = " ") -> np.ndarray:
        """Reference-conditioned generation (Flux2ImageEdit.edit_array).

        `images` are float arrays [H, W, 3] in [0, 255] or [0, 1]; each is
        VAE-encoded and appended to the image token stream with t-coords
        10, 20, ... (reference _prepare_reference_latents).
        """
        if not images:
            raise ValueError("At least one reference image is required")
        if "encoder" not in self.vae_params:
            raise RuntimeError("pipeline was loaded without the VAE encoder")
        if width is None or height is None:
            h0, w0 = np.asarray(images[0]).shape[:2]
            scale = min(1.0, float(np.sqrt((1024 * 1024) / (h0 * w0))))
            width = max(256, min(2048, int(w0 * scale) // 16 * 16))
            height = max(256, min(2048, int(h0 * scale) // 16 * 16))
        validate_dimensions(width=width, height=height)
        embeds = self._resolve_embeds(prompt, prompt_embeds,
                                      max_sequence_length, guidance,
                                      negative_prompt)
        latents, ids, lh, lw = prepare_packed_latents(
            jax.random.PRNGKey(seed), height=height, width=width,
            num_latent_channels=self.vae_config.latent_channels,
            dtype=self._dtype)

        ref_tokens, ref_ids = [], []
        for i, img in enumerate(images):
            arr = self._prep_image(img, width, height)
            lat = vae_encode(self.vae_params, arr, self.vae_config)
            lat = lat[:, :lat.shape[1] // 2 * 2, :lat.shape[2] // 2 * 2]
            patched = bn_normalize(self.vae_params, patchify(lat),
                                   self.vae_config.bn_eps)
            ref_tokens.append(pack(patched).astype(latents.dtype))
            ref_ids.append(grid_ids(patched.shape[1], patched.shape[2],
                                    t_coord=10 + 10 * i))
        all_latents = jnp.concatenate([latents] + ref_tokens, axis=1)
        all_ids = np.concatenate([ids] + ref_ids, axis=0)
        cos, sin = self._rope(embeds.shape[1], all_ids)
        out = self._denoise(all_latents, embeds, cos, sin,
                            image_seq_len=lh * lw, steps=steps,
                            guidance=guidance, n_gen=lh * lw)
        return self._finish(out[:, :lh * lw], lh, lw)

    # ------------------------------------------------------------ helpers
    def _resolve_embeds(self, prompt, prompt_embeds, max_seq, guidance,
                        negative_prompt) -> jax.Array:
        """[1 or 2, S, joint] — row 1 is the negative prompt for CFG,
        encoded at the positive prompt's bucket so both rows batch."""
        if prompt_embeds is None:
            if prompt is None:
                raise ValueError("prompt or prompt_embeds is required")
            prompt_embeds = self.encode_prompt(
                prompt, max_sequence_length=max_seq)
        if guidance is not None and guidance > 1.0 and prompt_embeds.shape[0] == 1:
            neg = self.encode_prompt(negative_prompt,
                                     max_sequence_length=max_seq,
                                     bucket=prompt_embeds.shape[1])
            prompt_embeds = jnp.concatenate([prompt_embeds, neg], axis=0)
        return prompt_embeds

    def _rope(self, n_txt: int, img_ids: np.ndarray):
        cfg = self.dit.config
        ids = np.concatenate([text_ids(n_txt), img_ids], axis=0)
        cos, sin = pos_rope(ids, cfg.axes_dims_rope, cfg.rope_theta)
        return jnp.asarray(cos), jnp.asarray(sin)

    def _denoise(self, latents, embeds, cos, sin, *, image_seq_len, steps,
                 guidance, n_gen):
        sched = FlowMatchEulerScheduler(image_seq_len, steps)
        cfg_on = embeds.shape[0] == 2
        if cfg_on:
            latents = jnp.tile(latents, (2, 1, 1))
        g = jnp.float32(guidance)
        for i in range(steps):
            t = jnp.float32(sched.timesteps[i])
            dt = jnp.float32(sched.sigmas[i + 1] - sched.sigmas[i])
            latents = self._step(self.dit_params, latents, embeds, cos, sin,
                                 t, dt, g, n_gen=n_gen)
            if cfg_on and latents.shape[0] == 1:
                latents = jnp.tile(latents, (2, 1, 1))
        return latents[:1]

    def _finish(self, packed_tokens, lh, lw) -> np.ndarray:
        packed = unpack(packed_tokens, lh, lw)
        decoded = self._decode(self.vae_params, packed)
        img = jnp.clip(decoded[0].astype(jnp.float32) / 2 + 0.5, 0, 1)
        return np.asarray(jnp.round(img * 255).astype(jnp.uint8))

    @staticmethod
    def _prep_image(img: np.ndarray, width: int, height: int) -> jax.Array:
        """To [1, H, W, 3] in [-1, 1], resized on device if needed
        (reference _load_reference_image + _reference_image_array)."""
        arr = np.asarray(img, np.float32)
        if arr.max() > 1.5:
            arr = arr / 127.5 - 1.0
        else:
            arr = arr * 2.0 - 1.0
        x = jnp.asarray(arr)[None]
        if x.shape[1] != height or x.shape[2] != width:
            x = jax.image.resize(x, (1, height, width, 3), "bilinear")
        return x
