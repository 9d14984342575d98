"""LFM2-MoE (Liquid) — gated short-conv/attention hybrid with MoE FFNs.

Role parity: reference mlx_vlm/models/lfm2_moe/language.py — the lfm2
decoder whose layers past num_dense_layers swap the SwiGLU FFN for a
softmax-then-bias top-k expert block (Lfm2MoeSparseMoeBlock in
lfm2/language.py:169: softmax over ALL experts, optional expert_bias
added BEFORE selection, weights taken from the biased scores with
optional renormalisation).

TPU design: the run-length grouped scans split on (operator, ffn-kind) —
four role stacks (conv/attn x dense/moe) sharing the hybrid cache, with
cache slices addressed by each run's conv/attn ordinal range.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ...core.layers import linear, rms_norm
from ...core.mask import causal_cache_mask
from ...core.moe import switch_glu
from ...core.rope import default_inv_freq, rope_cos_sin
from ..lfm2.lfm2 import Lfm2Cache
from ..lfm2.lfm2 import LanguageModel as _Lfm2LM
from ..lfm2.lfm2 import Model as _Lfm2Model
from ..lfm2.lfm2 import TextConfig as _Lfm2Text


@dataclass
class ModelConfig(_Lfm2Text):
    model_type: str = "lfm2_moe"
    moe_intermediate_size: int = 1792
    num_experts: int = 32
    num_experts_per_tok: int = 4
    norm_topk_prob: bool = True
    use_expert_bias: bool = True
    num_dense_layers: int = 2


TextConfig = ModelConfig


class LanguageModel(_Lfm2LM):
    def __init__(self, args: ModelConfig, config=None):
        super().__init__(args, config)
        nd = args.num_dense_layers
        self.labels = [
            ("attn" if p == "*" else "conv")
            + ("_dense" if i < nd else "_moe")
            for i, p in enumerate(self.pattern)
        ]
        # [(label, layer_start, count)] in layer order
        self.label_runs = []
        i = 0
        while i < len(self.labels):
            t = self.labels[i]
            n = 1
            while i + n < len(self.labels) and self.labels[i + n] == t:
                n += 1
            self.label_runs.append((t, i, n))
            i += n
        # per-layer ordinal within its conv/attn cache array
        self.op_ordinal = []
        counts = {"M": 0, "*": 0}
        for c in self.pattern:
            self.op_ordinal.append(counts[c])
            counts[c] += 1

    def _moe_ffn(self, p, x):
        a = self.args
        B, S, D = x.shape
        flat = x.reshape(B * S, D)
        gates = jax.nn.softmax(
            linear(p["gate"], flat).astype(jnp.float32), axis=-1)
        if "expert_bias" in p:
            gates = gates + p["expert_bias"]
        top, idx = jax.lax.top_k(gates, a.num_experts_per_tok)
        if a.norm_topk_prob:
            top = top / (top.sum(-1, keepdims=True) + 1e-20)
        sm = p["experts"]
        out = switch_glu(
            flat, sm["gate_proj"]["weight"], sm["up_proj"]["weight"],
            sm["down_proj"]["weight"], idx, top.astype(x.dtype))
        return out.reshape(B, S, D)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        a = self.args
        B, S, D = inputs_embeds.shape
        eps = a.norm_eps
        if position_ids.ndim == 3:
            position_ids = position_ids[0]
        pos_row = jnp.broadcast_to(
            position_ids if position_ids.ndim == 2 else position_ids[None],
            (B, S))
        cos, sin = rope_cos_sin(position_ids, self.inv_freq)
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        mask = causal_cache_mask(cache.offset, cache.left_pad, S,
                                 cache.capacity)
        slots = cache.offset + jnp.arange(S, dtype=jnp.int32)
        valid = (slots[None, :] >= cache.left_pad[:, None]) & (
            (pos_row > 0) | (slots[None, :] == 0))

        h = inputs_embeds
        mp = params["model"]
        conv_new = cache.conv
        k_new, v_new = cache.k, cache.v

        def mk_conv_body(moe):
            def body(h, xs):
                lp, cv = xs
                x = rms_norm(lp["operator_norm"], h, eps)
                r, cv = self._short_conv(lp["conv"], x, cv, valid)
                h = h + r
                x = rms_norm(lp["ffn_norm"], h, eps)
                h = h + (self._moe_ffn(lp["feed_forward"], x) if moe
                         else self._ffn(lp["feed_forward"], x))
                return h, cv
            return body

        def mk_attn_body(moe):
            def body(h, xs):
                lp, kb, vb = xs
                x = rms_norm(lp["operator_norm"], h, eps)
                r, kb, vb = self._attention(lp["self_attn"], x, cos, sin,
                                            mask, cache.offset, kb, vb)
                h = h + r
                x = rms_norm(lp["ffn_norm"], h, eps)
                h = h + (self._moe_ffn(lp["feed_forward"], x) if moe
                         else self._ffn(lp["feed_forward"], x))
                return h, (kb, vb)
            return body

        pos_in_group: dict = {}
        for label, start, n in self.label_runs:
            g0 = pos_in_group.get(label, 0)
            pos_in_group[label] = g0 + n
            lp = jax.tree.map(lambda x: x[g0:g0 + n],
                              mp[label + "_layers"])
            op0 = self.op_ordinal[start]
            if label.startswith("conv"):
                cv = cache.conv[op0:op0 + n]
                h, cv_y = jax.lax.scan(
                    mk_conv_body(label.endswith("moe")), h, (lp, cv))
                conv_new = jax.lax.dynamic_update_slice_in_dim(
                    conv_new, cv_y, op0, 0)
            else:
                kb = cache.k[op0:op0 + n]
                vb = cache.v[op0:op0 + n]
                h, (k_y, v_y) = jax.lax.scan(
                    mk_attn_body(label.endswith("moe")), h, (lp, kb, vb))
                k_new = jax.lax.dynamic_update_slice_in_dim(k_new, k_y,
                                                            op0, 0)
                v_new = jax.lax.dynamic_update_slice_in_dim(v_new, v_y,
                                                            op0, 0)

        h = rms_norm(mp["embedding_norm"], h, eps)
        if made:
            return h, None
        return h, Lfm2Cache(
            conv=conv_new, k=k_new, v=v_new,
            offset=cache.offset + S, left_pad=cache.left_pad)


class Model(_Lfm2Model):
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config)

    def sanitize(self, weights: dict) -> dict:
        lm = self.language_model
        a = self.config
        E = a.num_experts
        ordinal: dict = {}
        group_of = []
        for lab in lm.labels:
            group_of.append((lab, ordinal.get(lab, 0)))
            ordinal[lab] = ordinal.get(lab, 0) + 1
        layer_re = re.compile(
            r"^(?:language_model\.)?model\.layers\.(\d+)\.(.+)$")
        ren = {"w1": "gate_proj", "w2": "down_proj", "w3": "up_proj"}
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if "conv.weight" in k and getattr(v, "ndim", 0) == 3:
                v = v.reshape(v.shape[0], -1) if v.shape[1] == 1 else (
                    v[..., 0])
            m = layer_re.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                em = re.match(
                    r"^feed_forward\.experts\.(\d+)\.(w1|w2|w3)\.(.+)$",
                    rest)
                if em:
                    rest = (f"feed_forward.experts.{em.group(1)}."
                            f"{ren[em.group(2)]}.{em.group(3)}")
                lab, o = group_of[i]
                k = f"model.{lab}_layers.{o}.{rest}"
            if not k.startswith("language_model."):
                k = "language_model." + k
            # canonical: experts ride under switch_mlp after stacking
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        pats = []
        for lab in ("conv_dense", "conv_moe", "attn_dense", "attn_moe"):
            pats.append(f"language_model.model.{lab}_layers")
        for lab in ("conv_moe", "attn_moe"):
            pats.append(
                (f"language_model.model.{lab}_layers.feed_forward.experts",
                 1))
        return tuple(pats)
