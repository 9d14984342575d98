"""Gemma-3n text decoder (AltUp + Laurel + per-layer inputs + KV sharing).

Role parity: reference mlx_vlm/models/gemma3n/language.py —
Gemma3nAltUp (predict/correct with tanh router):215-292, Laurel
block:60-82, gelu_topk activation sparsity:173-178, per-layer input
embeddings + projection:568-596, KV-shared tail layers reusing the last
concrete full/sliding layer's cache:386-463, sqrt(D) embed scale, final
logit softcap.

TPU design:
- All layers share one weight structure, so the whole depth runs as TWO
  lax.scans: concrete layers (write KV) then KV-shared layers (read the
  last concrete full/sliding buffers, selected by a scanned flag).
- Per-layer input embeddings ride CHANNEL-PACKED in inputs_embeds
  ([B, S, D + L*Dp]) so engines keep their single-array interface; both
  get_input_embeddings and the decode-path embed() produce the same width.
- The AltUp 4-way hidden state is the scan carry ([4, B, S, D]).
"""

from __future__ import annotations

import inspect
import math
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core import cache as cache_lib
from ...core.config import BaseModelConfig
from ...core.layers import embedding, embedding_as_linear, linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.rope import apply_rope, default_inv_freq, rope_cos_sin
from ...ops.attention import sdpa
from ..llama.llama import text_position_ids


@dataclass
class TextConfig(BaseModelConfig):
    model_type: str = "gemma3n_text"
    hidden_size: int = 2048
    num_hidden_layers: int = 30
    intermediate_size: int = 8192
    num_attention_heads: int = 8
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    vocab_size: int = 262400
    vocab_size_per_layer_input: int = 262144
    num_key_value_heads: int = 2
    laurel_rank: int = 64
    altup_active_idx: int = 0
    altup_num_inputs: int = 4
    altup_coef_clip: Optional[float] = None
    altup_correct_scale: bool = True
    hidden_size_per_layer_input: int = 256
    rope_local_base_freq: float = 10000.0
    rope_theta: float = 1000000.0
    sliding_window: int = 512
    sliding_window_pattern: int = 5
    activation_sparsity_pattern: Optional[List[float]] = None
    final_logit_softcapping: float = 30.0
    num_kv_shared_layers: int = 0
    max_position_embeddings: int = 32768
    layer_types: Optional[List[str]] = None

    def __post_init__(self):
        if isinstance(self.intermediate_size, (list, tuple)):
            self.intermediate_size = int(self.intermediate_size[0])
        if self.layer_types is None:
            p = self.sliding_window_pattern
            self.layer_types = [
                "full_attention" if (i + 1) % p == 0 else "sliding_attention"
                for i in range(self.num_hidden_layers)
            ]


ModelConfig = TextConfig


class LanguageModel:
    def __init__(self, args: TextConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.n_heads = a.num_attention_heads
        self.n_kv_heads = a.num_key_value_heads
        self.head_dim = a.head_dim
        self.scale = 1.0  # q is RMS-normalized (reference language.py:96)
        self.inv_local = jnp.asarray(
            default_inv_freq(a.head_dim, a.rope_local_base_freq), jnp.float32
        )
        self.inv_global = jnp.asarray(
            default_inv_freq(a.head_dim, a.rope_theta), jnp.float32
        )
        self.L = a.num_hidden_layers
        self.n_concrete = self.L - a.num_kv_shared_layers
        self.is_global = np.asarray(
            [t == "full_attention" for t in a.layer_types]
        )
        concrete = a.layer_types[: self.n_concrete]
        self.shared_full_idx = (
            len(concrete) - 1 - concrete[::-1].index("full_attention")
            if "full_attention" in concrete else 0
        )
        self.shared_sliding_idx = (
            len(concrete) - 1 - concrete[::-1].index("sliding_attention")
            if "sliding_attention" in concrete else 0
        )
        sp = a.activation_sparsity_pattern or [0.0] * self.L

        def std_mult(s):
            if s <= 0:
                return 0.0
            import jax.scipy.special as jss

            return float(math.sqrt(2.0) * jss.erfinv(jnp.asarray(2 * s - 1.0)))

        self.std_mults = np.asarray([std_mult(s) for s in sp], np.float32)
        self.has_sparsity = np.asarray([s > 0 for s in sp])
        self.Dp = a.hidden_size_per_layer_input

    # -------------------------------------------------------------- embeds
    def embed(self, params, input_ids):
        """[B, S, D + L*Dp]: scaled token embeds | raw per-layer embeds."""
        a = self.args
        mp = params["model"]
        h = embedding(mp["embed_tokens"], input_ids) * jnp.asarray(
            a.hidden_size**0.5, jnp.float32
        ).astype(mp["embed_tokens"]["weight"].dtype)
        ids = jnp.where(
            input_ids < a.vocab_size_per_layer_input, input_ids, 0
        )
        pl = embedding(mp["embed_tokens_per_layer"], ids) * (
            self.Dp**0.5
        )  # [B, S, L*Dp]
        return jnp.concatenate([h, pl.astype(h.dtype)], axis=-1)

    # ----------------------------------------------------------------- jit
    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        D = a.hidden_size
        B, S, width = inputs_embeds.shape
        eps = a.rms_norm_eps
        mp = params["model"]
        h0 = inputs_embeds[..., :D]
        pl_raw = inputs_embeds[..., D:].reshape(B, S, self.L, self.Dp)
        # project_per_layer_inputs (reference language.py:580)
        proj = linear(mp["per_layer_model_projection"], h0) * (D**-0.5)
        proj = proj.reshape(B, S, self.L, self.Dp)
        proj = rms_norm(mp["per_layer_projection_norm"], proj, eps)
        per_layer = (proj + pl_raw.astype(proj.dtype)) * (2.0**-0.5)
        per_layer = jnp.moveaxis(per_layer, 2, 0)  # [L, B, S, Dp]

        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        cos_l, sin_l = rope_cos_sin(position_ids, self.inv_local)
        cos_g, sin_g = rope_cos_sin(position_ids, self.inv_global)

        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask_g = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity)
        mask_l = causal_cache_mask(cache.offset, cache.left_pad, S,
                                   cache.capacity, window=a.sliding_window)

        # altup expand (reference language.py:531-538)
        target_mag = jnp.sqrt(jnp.mean(h0.astype(jnp.float32)**2, axis=-1,
                                       keepdims=True))
        hs = [h0.astype(jnp.float32)]
        for i in range(a.altup_num_inputs - 1):
            hs.append(linear(mp["altup_projections"][str(i)], h0)
                      .astype(jnp.float32))
        h = jnp.stack(hs, axis=0)  # [A, B, S, D]
        mags = jnp.sqrt(jnp.mean(h[1:]**2, axis=-1, keepdims=True))
        h = h.at[1:].multiply(target_mag / jnp.maximum(mags, 1e-30))
        h = h.astype(h0.dtype)

        flags = jnp.asarray(self.is_global)
        smult = jnp.asarray(self.std_mults)
        sflag = jnp.asarray(self.has_sparsity)

        def attn_block(lp, x, is_g, kv, write):
            """x normed active prediction; kv = (k_buf, v_buf)."""
            cos = jnp.where(is_g, cos_g, cos_l)
            sin = jnp.where(is_g, sin_g, sin_l)
            mask = jnp.where(is_g, mask_g, mask_l)
            sa = lp["self_attn"]
            q = linear(sa["q_proj"], x).reshape(B, S, self.n_heads,
                                                self.head_dim)
            q = rms_norm(sa["q_norm"], q, eps).transpose(0, 2, 1, 3)
            k_buf, v_buf = kv
            if write:
                k = linear(sa["k_proj"], x).reshape(B, S, self.n_kv_heads,
                                                    self.head_dim)
                k = rms_norm(sa["k_norm"], k, eps).transpose(0, 2, 1, 3)
                v = linear(sa["v_proj"], x).reshape(B, S, self.n_kv_heads,
                                                    self.head_dim)
                v = _weightless_rms(v, eps).transpose(0, 2, 1, 3)
                _, k = apply_rope(k, k, cos, sin)
                k_buf, v_buf = cache_lib.update_layer_auto(
                    k_buf, v_buf, k, v, cache.offset
                )
            q, _ = apply_rope(q, q, cos, sin)
            attn = sdpa(q, k_buf, v_buf, self.scale, mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1)
            return linear(sa["o_proj"], attn), (k_buf, v_buf)

        def layer_body(h, lp, pl_i, is_g, sm, sf, kv, write):
            # altup predict (reference :242-269)
            A = a.altup_num_inputs
            au = lp["altup"]
            act = h[a.altup_active_idx]
            router_in = rms_norm(au["router_norm"], act, eps) * (D**-1.0)
            modal = jnp.tanh(
                linear(au["modality_router"], router_in).astype(jnp.float32)
            )
            pw = au["prediction_coefs"]["weight"].astype(jnp.float32)
            if a.altup_coef_clip is not None:
                pw = jnp.clip(pw, -a.altup_coef_clip, a.altup_coef_clip)
            coefs = (modal @ pw.T).reshape(B, S, A, A)  # C[z, a] layout
            hf = h.astype(jnp.float32)
            pred = jnp.einsum("absd,bsza->zbsd", hf, coefs) + hf
            pred = pred.astype(h.dtype)
            active = pred[a.altup_active_idx]
            x = rms_norm(lp["input_layernorm"], active, eps)
            # laurel
            la = lp["laurel"]
            lx = linear(la["linear_right"], linear(la["linear_left"], x))
            laurel = x + rms_norm(la["post_laurel_norm"], lx, eps)
            attn, kv = attn_block(lp, x, is_g, kv, write)
            attn = rms_norm(lp["post_attention_layernorm"], attn, eps)
            gated = active + attn
            attn_laurel = (gated + laurel) * (2.0**-0.5)
            xff = rms_norm(lp["pre_feedforward_layernorm"], attn_laurel, eps)
            gate = linear(lp["mlp"]["gate_proj"], xff)
            gate32 = gate.astype(jnp.float32)
            cutoff = (jnp.mean(gate32, -1, keepdims=True)
                      + jnp.std(gate32, -1, keepdims=True) * sm)
            sparse = jax.nn.gelu(jnp.maximum(0.0, gate32 - cutoff),
                                 approximate=True)
            dense = jax.nn.gelu(gate32, approximate=True)
            acts = jnp.where(sf, sparse, dense).astype(gate.dtype)
            ff = linear(lp["mlp"]["down_proj"],
                        acts * linear(lp["mlp"]["up_proj"], xff))
            ffn = rms_norm(lp["post_feedforward_layernorm"], ff, eps)
            activated = attn_laurel + ffn
            # altup correct (reference :271-292)
            modal_c = jnp.tanh(
                linear(au["modality_router"],
                       rms_norm(au["router_norm"], activated, eps)
                       * (D**-1.0)).astype(jnp.float32)
            )
            cw = au["correction_coefs"]["weight"].astype(jnp.float32)
            if a.altup_coef_clip is not None:
                cw = jnp.clip(cw, -a.altup_coef_clip, a.altup_coef_clip)
            ccoefs = (modal_c @ cw.T) + 1.0  # [B, S, A]
            innov = (activated - active).astype(jnp.float32)
            corrected = (jnp.moveaxis(ccoefs, -1, 0)[..., None] * innov[None]
                         + pred.astype(jnp.float32)).astype(h.dtype)
            first = corrected[a.altup_active_idx]
            if a.altup_correct_scale:
                first = first * lp["altup"]["correct_output_scale"]
            gatep = jax.nn.gelu(
                linear(lp["per_layer_input_gate"], first), approximate=True
            )
            gatep = gatep * pl_i.astype(gatep.dtype)
            gatep = linear(lp["per_layer_projection"], gatep)
            gatep = rms_norm(lp["post_per_layer_input_norm"], gatep, eps)
            corrected = corrected.at[1:].add(gatep[None].astype(h.dtype))
            return corrected, kv

        nC = self.n_concrete
        layers = mp["layers"]
        first = jax.tree.map(lambda x: x[:nC], layers)
        cxs = cache.scan_arrays()

        def concrete(hc, xs):
            lp, pl_i, is_g, sm, sf, kv = xs
            h, kv = layer_body(hc, lp, pl_i, is_g, sm, sf, kv, write=True)
            return h, kv

        h, cys = jax.lax.scan(
            concrete, h,
            (first, per_layer[:nC], flags[:nC], smult[:nC], sflag[:nC], cxs),
        )
        if nC < self.L:
            rest = jax.tree.map(lambda x: x[nC:], layers)
            kv_full = (cys[0][self.shared_full_idx],
                       cys[1][self.shared_full_idx])
            kv_slid = (cys[0][self.shared_sliding_idx],
                       cys[1][self.shared_sliding_idx])

            def shared(hc, xs):
                lp, pl_i, is_g, sm, sf = xs
                kv = (jnp.where(is_g, kv_full[0], kv_slid[0]),
                      jnp.where(is_g, kv_full[1], kv_slid[1]))
                h, _ = layer_body(hc, lp, pl_i, is_g, sm, sf, kv, write=False)
                return h, None

            h, _ = jax.lax.scan(
                shared, h,
                (rest, per_layer[nC:], flags[nC:], smult[nC:], sflag[nC:]),
            )

        # collapse altup streams (reference :556-566)
        hf = h.astype(jnp.float32)
        target_mag = jnp.sqrt(jnp.mean(hf[0]**2, axis=-1, keepdims=True))
        outs = [hf[0]]
        for i in range(a.altup_num_inputs - 1):
            outs.append(
                linear(mp["altup_unembed_projections"][str(i)], h[i + 1])
                .astype(jnp.float32)
            )
        hu = jnp.stack(outs, axis=0)
        mags = jnp.sqrt(jnp.mean(hu[1:]**2, axis=-1, keepdims=True))
        hu = hu.at[1:].multiply(target_mag / jnp.maximum(mags, 1e-30))
        out = jnp.mean(hu, axis=0).astype(inputs_embeds.dtype)
        out = rms_norm(mp["norm"], out, eps)
        return out, (None if made else cache.with_arrays(cys, S))

    def logits(self, params, hidden):
        out = embedding_as_linear(params["model"]["embed_tokens"], hidden)
        cap = self.args.final_logit_softcapping
        if cap:
            out = jnp.tanh(out / cap) * cap
        return out

    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None):
        return cache_lib.init_cache(
            self.n_concrete, batch_size, self.n_kv_heads, self.head_dim,
            capacity, dtype, left_pad,
        )


def _weightless_rms(x, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache, position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            k = k.replace("model.language_model.", "language_model.model.")
            if k.startswith("model."):
                k = "language_model." + k
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)
