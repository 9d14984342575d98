"""GLM-4.5/4.6 MoE decoder: partial-rotary llama attention + noaux_tc MoE.

Role parity: reference mlx_vlm/models/glm4_moe/language.py — Attention
with partial rotary + optional per-head qk-norm (:18), sigmoid-scored
group-limited expert selection (group_expert_select:83), first-k-dense
layers (DecoderLayer:180), shared experts always added (MoE:167).

TPU design: first_k_dense_replace makes the layer stack heterogeneous, so
the decoder runs as TWO sequential `lax.scan`s over role-split stacks
(dense prefix, MoE rest) sharing one KV cache whose per-layer arrays are
sliced per role — same pattern as gemma4_text's role-split scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.layers import rms_norm, swiglu_mlp
from ...core.moe import group_expert_select, switch_glu
from ...core.quant_scan import scan_layers
from ...core.mask import causal_cache_mask
from ...core.rope import make_rope
from ..llama.language import LanguageModel as _Base
from .config import TextConfig


class LanguageModel(_Base):
    def __init__(self, args: TextConfig, config=None):
        super().__init__(args, config)
        # partial rotary: only the first head_dim * factor lanes rotate
        self.rope = make_rope(
            int(self.head_dim * args.partial_rotary_factor),
            args.rope_theta,
            args.rope_scaling,
            args.max_position_embeddings,
        )

    def _moe(self, p, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        logits = flat.astype(jnp.float32) @ p["gate"]["weight"].astype(
            jnp.float32).T
        idx, wts = group_expert_select(
            logits,
            p["gate"]["e_score_correction_bias"],
            a.num_experts_per_tok,
            a.n_group,
            a.topk_group,
            a.routed_scaling_factor,
            a.norm_topk_prob,
        )
        out = switch_glu(
            flat,
            p["experts"]["gate_proj"]["weight"],
            p["experts"]["up_proj"]["weight"],
            p["experts"]["down_proj"]["weight"],
            idx,
            wts.astype(x.dtype),
        )
        if "shared_experts" in p:
            out = out + swiglu_mlp(p["shared_experts"], flat)
        return out.reshape(B, S, D)

    def _block(self, lp, h, cos, sin, mask, cache, cxs, moe):
        x = self._norm(lp["input_layernorm"], h, self.args.rms_norm_eps)
        if cache is None:
            h = h + self._attention_nc(lp["self_attn"], x, cos, sin, mask)
            cxs = None
        else:
            attn, cxs = self._attention(lp["self_attn"], x, cos, sin, mask,
                                        cache, cxs)
            h = h + attn
        x = self._norm(lp["post_attention_layernorm"], h,
                       self.args.rms_norm_eps)
        h = h + (self._moe(lp["mlp"], x) if moe else swiglu_mlp(lp["mlp"], x))
        return h, cxs

    def _cos_sin(self, position_ids):
        return self.rope.cos_sin(position_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids,
                 causal=True):
        B, S, _ = inputs_embeds.shape
        cos, sin = self._cos_sin(position_ids)
        h = inputs_embeds
        mp = params["model"]
        kd = self.args.first_k_dense_replace

        if cache is None:
            if causal:
                zero = jnp.zeros((), jnp.int32)
                mask = causal_cache_mask(zero, jnp.zeros((B,), jnp.int32),
                                         S, S)
            else:
                # bidirectional full-sequence attention (diffusion LMs)
                mask = jnp.ones((B, 1, S, S), bool)

            def dense_nc(h, lp):
                h, _ = self._block(lp, h, cos, sin, mask, None, None, False)
                return h, None

            def moe_nc(h, lp):
                h, _ = self._block(lp, h, cos, sin, mask, None, None, True)
                return h, None

            if kd:
                h, _ = scan_layers(dense_nc, h, mp["dense_layers"],
                                   remat=self.remat)
            h, _ = scan_layers(moe_nc, h, mp["moe_layers"],
                               remat=self.remat)
            return self._norm(mp["norm"], h, self.args.rms_norm_eps), None

        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        cxs_all = cache.scan_arrays()
        dense_cxs = jax.tree_util.tree_map(lambda a: a[:kd], cxs_all)
        moe_cxs = jax.tree_util.tree_map(lambda a: a[kd:], cxs_all)

        def dense_layer(h, lp, cxs):
            return self._block(lp, h, cos, sin, mask, cache, cxs, False)

        def moe_layer(h, lp, cxs):
            return self._block(lp, h, cos, sin, mask, cache, cxs, True)

        if kd:
            h, cys_d = scan_layers(dense_layer, h, mp["dense_layers"],
                                   dense_cxs)
        h, cys_m = scan_layers(moe_layer, h, mp["moe_layers"], moe_cxs)
        if kd:
            cys = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), cys_d, cys_m)
        else:
            cys = cys_m
        h = self._norm(mp["norm"], h, self.args.rms_norm_eps)
        return h, cache.with_arrays(cys, S)
