"""DeepSeek-V4: hyper-connection residual streams + compressed/sparse
pooled attention (HISA indexing) + hash/bias-routed MoE.

Role parity: reference mlx_vlm/models/deepseek_v4 — hyper_connection.py
(HyperConnection:232, hc_expand:265, HyperHead:271, fused Metal sinkhorn
kernel :9), language.py (DeepseekV4RoPE:120, Compressor:430, Indexer:492,
LocalAttention:616, CompressedAttention:703, SparseCompressedAttention:806,
_sparse_pooled_attention:285, MoEGate:327 hash routing :100, sanitize:1436,
make_cache:1413), hisa_kernel.py (hisa_select:15), config.py compress
pattern :55.

TPU design:
- The reference's fused Metal sinkhorn+collapse kernel is a short chain of
  elementwise ops + two tiny matmuls — exactly what XLA fuses on its own;
  `hc_collapse`/`hc_expand` are pure jnp with the sinkhorn iterations as a
  static python loop (compiled once, no dispatch-per-iteration).
- Pooling caches are STATIC planes: raw (kv, gate) rows are cached at full
  capacity and each forward refreshes only the <= S//ratio + 1 windows the
  chunk touches (one gather + one dynamic_update_slice), so prefill and
  decode share one shape-static program.  (Production note: the raw gate
  plane could shrink to a ratio-sized remainder ring; kept full here for a
  single uniform cache tree.)
- Layer heterogeneity (ratios 0/4/128) is handled nemotron_h-style: layers
  are stacked per type and executed as run-grouped lax.scans.
- Hash MoE layers and bias layers share one param structure (sanitize
  synthesizes the missing table) so per-type stacks stay homogeneous; a
  scanned per-layer flag picks the routing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ...core.config import BaseModelConfig
from ...core.layers import linear, rms_norm
from ...core.moe import switch_glu
from ..llama.llama import text_position_ids

_TYPE_KEY = {"L": "local_layers", "C": "comp_layers", "S": "sparse_layers"}
_RATIO_TYPE = {0: "L", 128: "C", 4: "S"}


@dataclasses.dataclass
class ModelConfig(BaseModelConfig):
    model_type: str = "deepseek_v4"
    vocab_size: int = 129280
    hidden_size: int = 4096
    intermediate_size: int = 18432
    moe_intermediate_size: int = 2048
    num_hidden_layers: int = 43
    num_attention_heads: int = 64
    num_key_value_heads: int = 1
    n_shared_experts: int = 1
    n_routed_experts: int = 256
    routed_scaling_factor: float = 1.5
    q_lora_rank: int = 1024
    qk_rope_head_dim: int = 64
    num_experts_per_tok: int = 6
    norm_topk_prob: bool = True
    max_position_embeddings: int = 1048576
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict] = None
    attention_bias: bool = False
    head_dim: int = 512
    scoring_func: str = "sqrtsoftplus"
    compress_ratios: Optional[List[int]] = None
    compress_rope_theta: float = 160000.0
    hc_mult: int = 4
    hc_sinkhorn_iters: int = 20
    hc_eps: float = 1e-6
    num_hash_layers: int = 3
    swiglu_limit: float = 10.0
    sliding_window: int = 128
    o_groups: int = 8
    o_lora_rank: int = 1024
    index_n_heads: int = 64
    index_head_dim: int = 128
    index_topk: int = 512
    index_block: int = 64
    index_keep: int = 16
    num_nextn_predict_layers: int = 1
    tie_word_embeddings: bool = False
    eos_token_id: Optional[Union[int, List[int]]] = None

    def __post_init__(self):
        if not self.compress_ratios:
            n = self.num_hidden_layers
            self.compress_ratios = (
                [0] + [4 if i % 2 else 128 for i in range(max(n - 2, 0))]
                + ([0] if n >= 2 else []))
        self.compress_ratios = list(
            self.compress_ratios[: self.num_hidden_layers])
        bad = [r for r in self.compress_ratios if r not in (0, 4, 128)]
        if bad:
            raise ValueError(f"unsupported compress ratios: {bad}")


TextConfig = ModelConfig


# ------------------------------------------------------------------- rope
def v4_rope_rates(dims: int, base: float, head_dim: int,
                  scaling: Optional[dict], freq_scale: int = 1) -> np.ndarray:
    """Per-pair rotation RATES [head_dim//2]; identity (rate 0) pairs come
    FIRST (reference DeepseekV4RoPE._get_freqs:178 pads inf wavelengths)."""
    inv = 1.0 / (base ** (np.arange(0, dims, 2, dtype=np.float64) / dims))
    rt = (scaling or {}).get("type") or (scaling or {}).get("rope_type")
    if rt in ("yarn", "deepseek_yarn"):
        factor = scaling["factor"]
        orig = scaling["original_max_position_embeddings"]
        beta_fast = scaling.get("beta_fast", 32)
        beta_slow = scaling.get("beta_slow", 1)

        def cdim(nr):
            return dims * math.log(orig / (nr * 2 * math.pi)) \
                / (2 * math.log(base))

        low = max(math.floor(cdim(beta_fast)), 0)
        high = min(math.ceil(cdim(beta_slow)), dims - 1)
        if low == high:
            high += 0.001
        ramp = (np.arange(dims // 2, dtype=np.float64) - low) / (high - low)
        smooth = 1 - np.clip(ramp, 0, 1)
        inv = inv / factor * (1 - smooth) + inv * smooth
    nope = (head_dim - dims) // 2
    rates = np.concatenate([np.zeros(nope), inv]) / freq_scale
    return rates.astype(np.float32)


def v4_rope(x: jax.Array, positions: jax.Array, rates: jax.Array,
            inverse: bool = False) -> jax.Array:
    """Traditional (interleaved-pair) rope; positions broadcast over the
    second-to-last axis of x [..., S, D]."""
    ang = positions.astype(jnp.float32)[..., None] * rates
    if inverse:
        ang = -ang
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    xf = x.astype(jnp.float32)
    x0, x1 = xf[..., 0::2], xf[..., 1::2]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# -------------------------------------------------------- hyper connection
def hc_collapse(p: dict, x: jax.Array, hc: int, iters: int, eps: float,
                norm_eps: float):
    """x [B,L,HC,D] -> (collapsed [B,L,D], post [B,L,HC],
    comb [B,L,HC,HC]).  Reference HyperConnection.__call__:252 +
    _hc_split_sinkhorn_ops:204 — the Metal kernel re-expressed as jnp
    (XLA fuses the whole chain)."""
    B, L, H, D = x.shape
    y = x.astype(jnp.float32)
    z = y.reshape(B, L, H * D)
    z = z * jax.lax.rsqrt(jnp.mean(z * z, -1, keepdims=True) + norm_eps)
    mixes = z @ p["fn"].astype(jnp.float32).T  # [B, L, (2+HC)*HC]
    scale = p["scale"].astype(jnp.float32)
    base = p["base"].astype(jnp.float32)
    pre = jax.nn.sigmoid(mixes[..., :hc] * scale[0] + base[:hc]) + eps
    post = 2 * jax.nn.sigmoid(mixes[..., hc:2 * hc] * scale[1]
                              + base[hc:2 * hc])
    comb = (mixes[..., 2 * hc:].reshape(B, L, hc, hc) * scale[2]
            + base[2 * hc:].reshape(hc, hc))
    comb = jax.nn.softmax(comb, axis=-1) + eps
    comb = comb / (comb.sum(axis=-2, keepdims=True) + eps)
    for _ in range(max(iters - 1, 0)):
        comb = comb / (comb.sum(axis=-1, keepdims=True) + eps)
        comb = comb / (comb.sum(axis=-2, keepdims=True) + eps)
    collapsed = (pre[..., None] * y).sum(axis=2).astype(x.dtype)
    return collapsed, post, comb


def hc_expand(x: jax.Array, residual: jax.Array, post: jax.Array,
              comb: jax.Array) -> jax.Array:
    """Scatter a block output back across the HC streams (reference
    hc_expand:265)."""
    y = post[..., None] * x[:, :, None, :].astype(jnp.float32)
    y = y + jnp.einsum("blhg,blgd->blhd", comb.swapaxes(-1, -2),
                       residual.astype(jnp.float32))
    return y.astype(x.dtype)


def hc_head(p: dict, x: jax.Array, eps: float, norm_eps: float) -> jax.Array:
    """Final stream collapse (reference HyperHead:271)."""
    B, L, H, D = x.shape
    y = x.astype(jnp.float32)
    z = y.reshape(B, L, H * D)
    z = z * jax.lax.rsqrt(jnp.mean(z * z, -1, keepdims=True) + norm_eps)
    mixes = z @ p["fn"].astype(jnp.float32).T
    pre = jax.nn.sigmoid(mixes * p["scale"].astype(jnp.float32)
                         + p["base"].astype(jnp.float32)) + eps
    return (pre[..., None] * y).sum(axis=2).astype(x.dtype)


# ---------------------------------------------------------------- pooling
def pooled_refresh(raw_kv, raw_gate, pooled, ape, norm_w, rates, offset,
                   S: int, r: int, overlap: bool, eps: float):
    """Recompute the <= S//r + 1 pooling windows this chunk touches and
    write completed ones into the pooled plane (reference Compressor:456
    + _simple/_overlap_compress_kv:247,254, PoolingCache semantics).

    raw_kv/raw_gate [B, C, out]; pooled [B, Cp, hd]."""
    B, C, out_dim = raw_kv.shape
    hd = pooled.shape[-1]
    nW = S // r + 1
    w0 = offset // r
    wins = w0 + jnp.arange(nW)  # [nW]
    idx = wins[:, None] * r + jnp.arange(r)[None]  # [nW, r]
    kv = jnp.take(raw_kv, idx.reshape(-1), axis=1, mode="clip").reshape(
        B, nW, r, out_dim)
    gate = jnp.take(raw_gate, idx.reshape(-1), axis=1, mode="clip").reshape(
        B, nW, r, out_dim).astype(jnp.float32) + ape.astype(jnp.float32)
    if overlap:
        # window w mixes PREV window's first-half channels with its own
        # second half (reference _overlap_compress_kv:254)
        idx_p = jnp.maximum(idx - r, 0)
        kv_p = jnp.take(raw_kv, idx_p.reshape(-1), axis=1,
                        mode="clip").reshape(B, nW, r, out_dim)
        gate_p = jnp.take(raw_gate, idx_p.reshape(-1), axis=1,
                          mode="clip").reshape(B, nW, r, out_dim).astype(
            jnp.float32) + ape.astype(jnp.float32)
        kv_a = kv_p[..., : out_dim // 2]
        kv_b = kv[..., out_dim // 2:]
        first = (wins == 0)[None, :, None, None]
        g_a = jnp.where(first, -jnp.inf, gate_p[..., : out_dim // 2])
        g_b = gate[..., out_dim // 2:]
        cand = jnp.concatenate([kv_a, kv_b], axis=2)  # [B, nW, 2r, hd]
        g = jnp.concatenate([g_a, g_b], axis=2)
    else:
        cand, g = kv, gate
    w = jax.nn.softmax(g, axis=2).astype(cand.dtype)
    new = (cand * w).sum(axis=2)  # [B, nW, hd]
    new = rms_norm({"weight": norm_w}, new, eps)
    new = v4_rope(new, wins, rates)
    complete = ((wins + 1) * r <= offset + S)  # [nW]
    old = jnp.take(pooled, jnp.minimum(wins, pooled.shape[1] - 1), axis=1)
    merged = jnp.where(complete[None, :, None], new.astype(pooled.dtype),
                       old)
    # scatter (out-of-capacity tail windows dropped)
    return pooled.at[:, wins].set(merged, mode="drop")


def pooled_count(offset, S: int, r: int):
    """#complete windows after this chunk (pooled visibility bound)."""
    return (offset + S) // r


# --------------------------------------------------------------- attention
def _sink_softmax_attend(scores, kv_keys, sinks):
    """softmax over keys with a per-head sink logit (reference
    scaled_dot_product_attention sinks).  scores [B,H,L,K], kv [B,K,D]."""
    lse = jax.scipy.special.logsumexp(scores, axis=-1, keepdims=True)
    lse = jnp.logaddexp(lse, sinks[None, :, None, None])
    w = jnp.exp(scores - lse)
    return jnp.einsum("bhlk,bkd->bhld", w, kv_keys)


def hisa_select(q, pooled, weights, scale, k: int, index_block: int,
                index_keep: int, valid_len) -> jax.Array:
    """Two-stage hierarchical top-k over pooled index keys (reference
    hisa_kernel.py:15).  Static shapes: Kb/k fixed, invalid positions
    masked.  Returns [B, L, k] prefix indices."""
    B, H, L, D = q.shape
    Np = pooled.shape[1]
    b = index_block
    nb = Np // b
    usable = nb * b
    qf = q.astype(jnp.float32)
    pf = pooled.astype(jnp.float32)
    wk = weights.astype(jnp.float32) * scale  # [B, L, H]
    wk_h = wk.transpose(0, 2, 1)[..., None]  # [B, H, L, 1]

    rep = pf[:, :usable].reshape(B, nb, b, D).mean(axis=2)
    cs = jnp.maximum(jnp.einsum("bhld,bnd->bhln", qf, rep), 0)
    cscore = (cs * wk_h).sum(axis=1)  # [B, L, nb]
    block_start = jnp.arange(nb) * b
    cscore = jnp.where(block_start[None, None] < valid_len[..., None],
                       cscore, -1e30)
    Kb = min(index_keep, nb)
    _, top_blk = jax.lax.top_k(cscore, Kb)  # [B, L, Kb]

    C = Kb * b
    pos = (top_blk[..., None] * b
           + jnp.arange(b)[None, None, None]).reshape(B, L, C)
    cand = jnp.take_along_axis(
        pf[:, None], pos[..., None].repeat(D, -1), axis=2)  # [B, L, C, D]
    qbl = qf.transpose(0, 2, 1, 3)  # [B, L, H, D]
    fs = jnp.maximum(jnp.einsum("blhd,blcd->blhc", qbl, cand), 0)
    fscore = (fs * wk[..., None]).sum(axis=2)  # [B, L, C]
    fscore = jnp.where(pos < valid_len[..., None], fscore, -1e30)
    _, sel = jax.lax.top_k(fscore, k)
    return jnp.take_along_axis(pos, sel, axis=-1)


def sparse_pooled_attention(q, local_kv, pooled, topk, local_mask,
                            pooled_valid, scale, sinks):
    """Joint softmax over the local window + top-k pooled tokens
    (reference _sparse_pooled_attention:285)."""
    B, H, L, D = q.shape
    gathered = jnp.take_along_axis(
        pooled[:, None], topk[..., None].repeat(D, -1), axis=2)  # [B,L,K,D]
    qs = q * scale
    ls = jnp.einsum("bhld,bkd->bhlk", qs, local_kv)
    ls = jnp.where(local_mask, ls, -jnp.inf)
    norm = jax.scipy.special.logsumexp(ls, -1, keepdims=True)
    qbl = qs.transpose(0, 2, 1, 3)
    ps = jnp.einsum("blhd,blkd->bhlk",
                    qbl, gathered)  # [B, H, L, K]
    ps = jnp.where(pooled_valid[:, None], ps, -jnp.inf)
    norm = jnp.logaddexp(
        norm, jax.scipy.special.logsumexp(ps, -1, keepdims=True))
    norm = jnp.logaddexp(norm, sinks[None, :, None, None])
    lw = jnp.exp(ls - norm)
    pw = jnp.exp(ps - norm)
    out = lw @ local_kv[:, None]
    out = out + jnp.einsum("bhlk,blkd->bhld", pw, gathered)
    return out.astype(q.dtype)


# ------------------------------------------------------------------ cache
from functools import partial  # noqa: E402


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kv", "ckv", "cgate", "cpool", "skv", "sgate", "spool",
                 "ikv", "igate", "ipool", "offset", "left_pad"],
    meta_fields=[],
)
@dataclasses.dataclass
class DeepseekV4Cache:
    """Static planes: raw rope'd KV per layer, raw compressor inputs +
    pooled windows per compressed/sparse layer, indexer planes per sparse
    layer."""

    kv: jax.Array  # [L, B, C, hd]
    ckv: jax.Array  # [nC, B, C, hd] raw compressor kv (ratio 128)
    cgate: jax.Array
    cpool: jax.Array  # [nC, B, C//128, hd]
    skv: jax.Array  # [nS, B, C, 2*hd] (overlap, ratio 4)
    sgate: jax.Array
    spool: jax.Array  # [nS, B, C//4, hd]
    ikv: jax.Array  # [nS, B, C, 2*ihd]
    igate: jax.Array
    ipool: jax.Array  # [nS, B, C//4, ihd]
    offset: jax.Array
    left_pad: jax.Array

    @property
    def capacity(self) -> int:
        return self.kv.shape[2]


def runs(pattern: List[str]) -> List[Tuple[str, int, int]]:
    """Maximal same-type runs as (type, start, length)."""
    out: List[Tuple[str, int, int]] = []
    for i, c in enumerate(pattern):
        if out and out[-1][0] == c:
            t, s, n = out[-1]
            out[-1] = (t, s, n + 1)
        else:
            out.append((c, i, 1))
    return out


class LanguageModel:
    def __init__(self, args: ModelConfig, config=None):
        self.args = args
        self.config = config or args
        a = args
        self.pattern = [_RATIO_TYPE[r] for r in a.compress_ratios]
        self.runs = runs(self.pattern)
        self.n_local = self.pattern.count("L")
        self.n_comp = self.pattern.count("C")
        self.n_sparse = self.pattern.count("S")
        self.n_heads = a.num_attention_heads
        self.n_kv_heads = 1
        self.head_dim = a.head_dim
        self.scale = a.head_dim**-0.5
        # rope rate tables
        self.rates_local = jnp.asarray(v4_rope_rates(
            a.qk_rope_head_dim, a.rope_theta, a.head_dim, None))
        self.rates_comp = jnp.asarray(v4_rope_rates(
            a.qk_rope_head_dim, a.compress_rope_theta, a.head_dim,
            a.rope_scaling))
        self.rates_cpool = jnp.asarray(v4_rope_rates(
            a.qk_rope_head_dim, a.compress_rope_theta, a.head_dim,
            a.rope_scaling, freq_scale=128))
        self.rates_spool = jnp.asarray(v4_rope_rates(
            a.qk_rope_head_dim, a.compress_rope_theta, a.head_dim,
            a.rope_scaling, freq_scale=4))
        self.rates_ipool = jnp.asarray(v4_rope_rates(
            a.qk_rope_head_dim, a.compress_rope_theta, a.index_head_dim,
            a.rope_scaling, freq_scale=4))
        self.rates_idx = jnp.asarray(v4_rope_rates(
            a.qk_rope_head_dim, a.compress_rope_theta, a.index_head_dim,
            a.rope_scaling))
        # per-layer hash-routing flag, grouped per type stack
        self.hash_flags = {
            t: np.asarray([i < a.num_hash_layers
                           for i, c in enumerate(self.pattern) if c == t],
                          bool)
            for t in ("L", "C", "S")
        }

    owns_cache_factory = True

    # ------------------------------------------------------------- cache
    def init_cache(self, batch_size, capacity, dtype=jnp.bfloat16,
                   left_pad=None, **_):
        a = self.args
        B = batch_size
        # window capacity must cover the pooling ratio grid
        C = -(-capacity // 128) * 128
        hd, ihd = a.head_dim, a.index_head_dim
        if left_pad is None:
            left_pad = jnp.zeros((B,), jnp.int32)
        z = jnp.zeros
        nL, nC, nS = max(self.n_local, 1), max(self.n_comp, 1), \
            max(self.n_sparse, 1)
        return DeepseekV4Cache(
            kv=z((len(self.pattern), B, C, hd), dtype),
            ckv=z((nC, B, C, hd), dtype),
            cgate=z((nC, B, C, hd), dtype),
            cpool=z((nC, B, C // 128, hd), dtype),
            skv=z((nS, B, C, 2 * hd), dtype),
            sgate=z((nS, B, C, 2 * hd), dtype),
            spool=z((nS, B, C // 4, hd), dtype),
            ikv=z((nS, B, C, 2 * ihd), dtype),
            igate=z((nS, B, C, 2 * ihd), dtype),
            ipool=z((nS, B, C // 4, ihd), dtype),
            offset=jnp.zeros((), jnp.int32),
            left_pad=jnp.asarray(left_pad, jnp.int32),
        )

    def embed(self, params, input_ids):
        # stash the ids for hash MoE routing — the framework's decode step
        # calls embed() and __call__() inside ONE jit trace, so the traced
        # stash is consumed in-trace (prefill routes ids via the spare
        # position_ids plane instead; see Model.prepare_position_ids)
        self._pending_ids = input_ids
        table = params["model"]["embed_tokens"]["weight"]
        return jnp.take(table, jnp.maximum(input_ids, 0), axis=0)

    def logits(self, params, hidden):
        return linear(params["lm_head"], hidden)

    # ----------------------------------------------------------- helpers
    def _q(self, lp, x, offset, rates):
        a = self.args
        B, L, _ = x.shape
        qr = rms_norm(lp["q_norm"], linear(lp["wq_a"], x), a.rms_norm_eps)
        q = linear(lp["wq_b"], qr).reshape(B, L, self.n_heads, a.head_dim)
        qf = q.astype(jnp.float32)
        q = (qf * jax.lax.rsqrt(
            jnp.mean(qf * qf, -1, keepdims=True) + a.rms_norm_eps)
        ).astype(q.dtype)
        q = q.transpose(0, 2, 1, 3)
        pos = offset + jnp.arange(L)
        return v4_rope(q, pos, rates), qr, pos

    def _kv_update(self, lp, x, kv_plane, offset, pos, rates):
        a = self.args
        B, L, _ = x.shape
        kv = rms_norm(lp["kv_norm"], linear(lp["wkv"], x), a.rms_norm_eps)
        kv = v4_rope(kv, pos[None], rates)
        return jax.lax.dynamic_update_slice(
            kv_plane, kv.astype(kv_plane.dtype), (0, offset, 0))

    def _local_mask(self, offset, L, C, left_pad):
        q_pos = offset + jnp.arange(L)
        k_pos = jnp.arange(C)
        causal = k_pos[None, :] <= q_pos[:, None]
        window = k_pos[None, :] > q_pos[:, None] - self.args.sliding_window
        valid = k_pos[None, None, :] >= left_pad[:, None, None]
        return ((causal & window)[None] & valid)[:, None]  # [B,1,L,C]

    def _wo(self, lp, out, L):
        """Grouped LoRA output projection (reference MultiLinear wo_a +
        wo_b, language.py:736-741)."""
        a = self.args
        B = out.shape[0]
        out = out.reshape(B, a.o_groups, -1, L, a.head_dim)
        out = out.transpose(0, 1, 3, 2, 4).reshape(
            B, a.o_groups, L, -1)  # [B, G, L, (H/G)*hd]
        out = jnp.einsum("bgli,goi->bglo", out,
                         lp["wo_a"]["weight"].astype(out.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, L, -1)
        return linear(lp["wo_b"], out)

    def _moe(self, lp, x, input_ids, is_hash):
        a = self.args
        B, L, D = x.shape
        xf = x.reshape(B * L, D)
        logits = (xf @ lp["gate"]["weight"].astype(xf.dtype).T).astype(
            jnp.float32)
        if a.scoring_func == "sqrtsoftplus":
            scores = jnp.sqrt(jax.nn.softplus(logits))
        elif a.scoring_func == "sigmoid":
            scores = jax.nn.sigmoid(logits)
        else:
            scores = jax.nn.softmax(logits, axis=-1)
        k = a.num_experts_per_tok
        biased = scores + lp["gate"]["e_score_correction_bias"]
        _, top_inds = jax.lax.top_k(biased, k)
        hash_inds = jnp.take(lp["gate"]["tid2eid"],
                             jnp.maximum(input_ids.reshape(-1), 0),
                             axis=0).astype(top_inds.dtype)
        inds = jnp.where(is_hash, hash_inds, top_inds)
        w = jnp.take_along_axis(scores, inds, axis=-1)
        if a.scoring_func != "softmax" and a.norm_topk_prob:
            w = w / (w.sum(-1, keepdims=True) + 1e-20)
        w = w * a.routed_scaling_factor

        limit = a.swiglu_limit

        def act2(g, u):
            if limit and limit > 0:
                g = jnp.minimum(g, limit)
                u = jnp.clip(u, -limit, limit)
            return jax.nn.silu(g) * u

        sw = lp["switch_mlp"]
        y = switch_glu(xf, sw["gate_proj"]["weight"],
                       sw["up_proj"]["weight"], sw["down_proj"]["weight"],
                       inds, w.astype(xf.dtype), act2=act2)
        sh = lp["shared_experts"]
        shared = linear(sh["down_proj"], act2(
            linear(sh["gate_proj"], xf), linear(sh["up_proj"], xf)))
        return (y + shared).reshape(B, L, D)

    # ------------------------------------------------------------ blocks
    def _block(self, t: str, lp, h, cache_slices, offset, left_pad,
               input_ids, is_hash):
        """One hyper-connected block; returns (h, new cache slices)."""
        a = self.args
        eps = a.rms_norm_eps
        B, L = h.shape[0], h.shape[1]
        residual = h
        x, post, comb = hc_collapse(lp["attn_hc"], h, a.hc_mult,
                                    a.hc_sinkhorn_iters, a.hc_eps, eps)
        x = rms_norm(lp["attn_norm"], x, eps)
        ap = lp["attn"]
        rates = self.rates_local if t == "L" else self.rates_comp
        q, qr, pos = self._q(ap, x, offset, rates)
        kv_plane = self._kv_update(ap, x, cache_slices["kv"], offset, pos,
                                   rates)
        C = kv_plane.shape[1]
        lmask = self._local_mask(offset, L, C, left_pad)
        sinks = ap["attn_sink"].astype(jnp.float32)
        new_slices = {"kv": kv_plane}

        if t == "L":
            qs = q * self.scale
            s = jnp.einsum("bhld,bkd->bhlk", qs,
                           kv_plane.astype(qs.dtype))
            s = jnp.where(lmask, s.astype(jnp.float32), -jnp.inf)
            out = _sink_softmax_attend(s, kv_plane.astype(jnp.float32),
                                       sinks).astype(q.dtype)
        else:
            r = 128 if t == "C" else 4
            comp = ap["compressor"]
            ckv = linear(comp["wkv"], x)
            cgate = linear(comp["wgate"], x)
            ckv_p = jax.lax.dynamic_update_slice(
                cache_slices["ckv"], ckv.astype(cache_slices["ckv"].dtype),
                (0, offset, 0))
            cg_p = jax.lax.dynamic_update_slice(
                cache_slices["cgate"],
                cgate.astype(cache_slices["cgate"].dtype), (0, offset, 0))
            prates = self.rates_cpool if t == "C" else self.rates_spool
            pooled = pooled_refresh(
                ckv_p, cg_p, cache_slices["cpool"], comp["ape"],
                comp["norm"]["weight"], prates, offset, L, r,
                overlap=(t == "S"), eps=eps)
            new_slices.update(ckv=ckv_p, cgate=cg_p, cpool=pooled)
            Np = pooled.shape[1]
            n_vis = pooled_count(offset, L, r)  # windows complete NOW
            # per-query pooled visibility: i < (pos+1) // r
            q_abs = offset + jnp.arange(L)
            pvalid = (jnp.arange(Np)[None, :]
                      < ((q_abs[:, None] + 1) // r))  # [L, Np]
            pvalid = pvalid & (jnp.arange(Np)[None, :] < n_vis)

            if t == "C":
                qs = q * self.scale
                s_loc = jnp.einsum("bhld,bkd->bhlk", qs,
                                   kv_plane.astype(qs.dtype))
                s_loc = jnp.where(lmask, s_loc.astype(jnp.float32),
                                  -jnp.inf)
                s_pool = jnp.einsum("bhld,bkd->bhlk", qs,
                                    pooled.astype(qs.dtype))
                s_pool = jnp.where(pvalid[None, None],
                                   s_pool.astype(jnp.float32), -jnp.inf)
                s = jnp.concatenate([s_loc, s_pool], axis=-1)
                allkv = jnp.concatenate(
                    [kv_plane, pooled], axis=1).astype(jnp.float32)
                out = _sink_softmax_attend(s, allkv, sinks).astype(q.dtype)
            else:  # sparse: indexer + HISA top-k
                idxr = ap["indexer"]
                icomp = idxr["compressor"]
                ikv = linear(icomp["wkv"], x)
                igate = linear(icomp["wgate"], x)
                ikv_p = jax.lax.dynamic_update_slice(
                    cache_slices["ikv"],
                    ikv.astype(cache_slices["ikv"].dtype), (0, offset, 0))
                ig_p = jax.lax.dynamic_update_slice(
                    cache_slices["igate"],
                    igate.astype(cache_slices["igate"].dtype),
                    (0, offset, 0))
                ipool = pooled_refresh(
                    ikv_p, ig_p, cache_slices["ipool"], icomp["ape"],
                    icomp["norm"]["weight"], self.rates_ipool, offset, L,
                    r, overlap=True, eps=eps)
                new_slices.update(ikv=ikv_p, igate=ig_p, ipool=ipool)
                ihd = a.index_head_dim
                qi = linear(idxr["wq_b"], qr).reshape(
                    B, L, a.index_n_heads, ihd).transpose(0, 2, 1, 3)
                qi = v4_rope(qi, q_abs, self.rates_idx)
                iw = (linear(idxr["weights_proj"], x).astype(jnp.float32)
                      * a.index_n_heads**-0.5)
                valid_len = ((q_abs[:, None] + 1) // r).astype(jnp.int32)
                valid_len = jnp.minimum(valid_len, n_vis)
                valid_len = jnp.broadcast_to(valid_len.reshape(1, L),
                                             (B, L))
                Npi = ipool.shape[1]
                k = min(a.index_topk, Npi)
                iscale = ihd**-0.5
                if (a.index_block > 0
                        and Npi >= a.index_block * a.index_keep
                        and a.index_keep * a.index_block >= k):
                    topk = hisa_select(qi, ipool, iw, iscale, k,
                                       a.index_block, a.index_keep,
                                       valid_len)
                else:
                    s_i = jnp.maximum(jnp.einsum(
                        "bhld,bkd->bhlk", qi.astype(jnp.float32),
                        ipool.astype(jnp.float32)), 0) * iscale
                    s_i = (s_i * iw.transpose(0, 2, 1)[..., None]).sum(1)
                    s_i = jnp.where(
                        jnp.arange(Npi)[None, None] < valid_len[..., None],
                        s_i, -1e30)
                    _, topk = jax.lax.top_k(s_i, k)
                sel_valid = jnp.take_along_axis(
                    jnp.broadcast_to(pvalid[None], (B, L, Np)), topk,
                    axis=-1)
                out = sparse_pooled_attention(
                    q, kv_plane.astype(jnp.float32),
                    pooled.astype(jnp.float32), topk, lmask, sel_valid,
                    self.scale, sinks)

        out = v4_rope(out, pos, rates, inverse=True)
        attn_out = self._wo(ap, out, L)
        h = hc_expand(attn_out, residual, post, comb)

        residual = h
        x, post, comb = hc_collapse(lp["ffn_hc"], h, a.hc_mult,
                                    a.hc_sinkhorn_iters, a.hc_eps, eps)
        x = rms_norm(lp["ffn_norm"], x, eps)
        y = self._moe(lp["ffn"], x, input_ids, is_hash)
        return hc_expand(y, residual, post, comb), new_slices

    # ----------------------------------------------------------- forward
    def __call__(self, params, inputs_embeds, cache, position_ids,
                 input_ids=None):
        a = self.args
        B, S, D = inputs_embeds.shape
        made = cache is None
        if made:
            cache = self.init_cache(B, S, inputs_embeds.dtype)
        if input_ids is None:
            pend = getattr(self, "_pending_ids", None)
            if pend is not None and pend.shape == (B, S):
                input_ids = pend
                self._pending_ids = None
            elif position_ids is not None and position_ids.ndim == 3:
                # prefill: token ids ride the spare plane (see
                # Model.prepare_position_ids)
                input_ids = position_ids[1].astype(jnp.int32)
            else:
                input_ids = jnp.zeros((B, S), jnp.int32)
        h = jnp.broadcast_to(inputs_embeds[:, :, None],
                             (B, S, a.hc_mult, D))
        mp = params["model"]
        offset = cache.offset
        left_pad = cache.left_pad
        planes = {
            "L": {"kv": cache.kv},
            "C": {"kv": cache.kv, "ckv": cache.ckv, "cgate": cache.cgate,
                  "cpool": cache.cpool},
            "S": {"kv": cache.kv, "ckv": cache.skv, "cgate": cache.sgate,
                  "cpool": cache.spool, "ikv": cache.ikv,
                  "igate": cache.igate, "ipool": cache.ipool},
        }
        new_kv = cache.kv
        news = {"C": {}, "S": {}}
        ordinals = {"L": 0, "C": 0, "S": 0}
        global_idx = 0
        kv_layers = [None] * len(self.pattern)
        for t, start, n in self.runs:
            key = _TYPE_KEY[t]
            for j in range(n):
                o = ordinals[t]
                lp = jax.tree.map(lambda v: v[o], mp[key])
                sl = {}
                for name, plane in planes[t].items():
                    if name == "kv":
                        sl["kv"] = new_kv[global_idx]
                    else:
                        src = news[t].get(name)
                        sl[name] = (src[o] if src is not None
                                    else plane[o])
                is_hash = jnp.asarray(bool(self.hash_flags[t][o]))
                h, out_slices = self._block(
                    t, lp, h, sl, offset, left_pad, input_ids, is_hash)
                kv_layers[global_idx] = out_slices.pop("kv")
                for name, v in out_slices.items():
                    acc = news[t].setdefault(
                        name, [None] * {"C": max(self.n_comp, 1),
                                        "S": max(self.n_sparse, 1)}[t])
                    acc[o] = v
                ordinals[t] += 1
                global_idx += 1

        h = hc_head(mp["hc_head"], h, a.hc_eps, a.rms_norm_eps)
        h = rms_norm(mp["norm"], h, a.rms_norm_eps)
        if made:
            return h, None

        def stack_or(old, lst):
            if lst is None:
                return old
            vals = [v if v is not None else old[i]
                    for i, v in enumerate(lst)]
            return jnp.stack(vals) if len(vals) == old.shape[0] else old

        new_cache = DeepseekV4Cache(
            kv=jnp.stack(kv_layers),
            ckv=stack_or(cache.ckv, news["C"].get("ckv")),
            cgate=stack_or(cache.cgate, news["C"].get("cgate")),
            cpool=stack_or(cache.cpool, news["C"].get("cpool")),
            skv=stack_or(cache.skv, news["S"].get("ckv")),
            sgate=stack_or(cache.sgate, news["S"].get("cgate")),
            spool=stack_or(cache.spool, news["S"].get("cpool")),
            ikv=stack_or(cache.ikv, news["S"].get("ikv")),
            igate=stack_or(cache.igate, news["S"].get("igate")),
            ipool=stack_or(cache.ipool, news["S"].get("ipool")),
            offset=offset + S,
            left_pad=left_pad,
        )
        return h, new_cache


class Model:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.language_model = LanguageModel(config, config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None,
                             **aux):
        out = self.language_model.embed(params["language_model"],
                                        input_ids)
        # prefill runs in a separate jit — drop the traced stash; the ids
        # travel on the position plane instead
        self.language_model._pending_ids = None
        return out

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        pos, deltas = text_position_ids(input_ids, attention_mask)
        pos = np.asarray(pos).copy()
        # plane 1 carries TOKEN IDS for hash MoE routing (plane 0 is the
        # real position; this LM reads only plane 0 for rope)
        pos[1] = np.asarray(input_ids)
        return pos, deltas

    def vision_aux_inputs(self, grid_thw):
        return {}

    # ------------------------------------------------------------ layout
    def sanitize(self, weights: dict) -> dict:
        a = self.config
        pattern = [_RATIO_TYPE[r] for r in a.compress_ratios]
        ordinal = []
        counts = {"L": 0, "C": 0, "S": 0}
        for c in pattern:
            ordinal.append(counts[c])
            counts[c] += 1

        out = {}
        top_remap = {
            "embed.weight": "model.embed_tokens.weight",
            "norm.weight": "model.norm.weight",
            "head.weight": "lm_head.weight",
            "hc_head_fn": "model.hc_head.fn",
            "hc_head_base": "model.hc_head.base",
            "hc_head_scale": "model.hc_head.scale",
        }
        import re

        layer_re = re.compile(
            r"^(?:language_model\.)?(?:model\.)?layers\.(\d+)\.(.+)$")
        for k, v in weights.items():
            if k.startswith("mtp."):
                continue
            k = k.removeprefix("language_model.")
            if k in top_remap:
                k = top_remap[k]
            m = layer_re.match(k)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                if i >= len(pattern):
                    continue
                if rest == "ffn.gate.bias":
                    rest = "ffn.gate.e_score_correction_bias"
                for sub in ("attn", "ffn"):
                    for pname in ("fn", "base", "scale"):
                        rest = rest.replace(f"hc_{sub}_{pname}",
                                            f"{sub}_hc.{pname}")
                for old, new in (("w1", "gate_proj"), ("w2", "down_proj"),
                                 ("w3", "up_proj")):
                    rest = rest.replace(f".shared_experts.{old}.",
                                        f".shared_experts.{new}.")
                k = (f"model.{_TYPE_KEY[pattern[i]]}.{ordinal[i]}.{rest}")
            if "tid2eid" in k:
                v = np.asarray(v, np.int32)
            out[k] = v

        # per-expert trees -> stacked switch_mlp (reference sanitize:1510)
        import collections

        expert_re = re.compile(
            r"^(model\.\w+\.\d+)\.ffn\.experts\.(\d+)\.(w1|w2|w3)\.weight$")
        groups = collections.defaultdict(dict)
        for k in list(out):
            m = expert_re.match(k)
            if m:
                groups[(m.group(1), m.group(3))][int(m.group(2))] = out.pop(
                    k)
        dst = {"w1": "gate_proj", "w2": "down_proj", "w3": "up_proj"}
        for (prefix, src), items in groups.items():
            stacked = np.stack([items[e] for e in sorted(items)])
            out[f"{prefix}.ffn.switch_mlp.{dst[src]}.weight"] = stacked

        # grouped wo_a flat [G*R, in] -> [G, R, in]
        for k in list(out):
            if k.endswith(".attn.wo_a.weight") and out[k].ndim == 2:
                out[k] = out[k].reshape(a.o_groups, a.o_lora_rank, -1)

        # synthesize the missing routing table so per-type stacks stay
        # homogeneous (hash layers lack the bias; bias layers lack tid2eid)
        for i, c in enumerate(pattern):
            p = f"model.{_TYPE_KEY[c]}.{ordinal[i]}.ffn.gate."
            out.setdefault(p + "tid2eid",
                           np.zeros((a.vocab_size, a.num_experts_per_tok),
                                    np.int32))
            out.setdefault(p + "e_score_correction_bias",
                           np.zeros(a.n_routed_experts, np.float32))
        return {("language_model." + k if not k.startswith(
            "language_model.") else k): v for k, v in out.items()}

    @property
    def stack_patterns(self):
        return tuple(f"language_model.model.{v}"
                     for v in _TYPE_KEY.values())


__all__ = ["Model", "ModelConfig", "TextConfig", "LanguageModel",
           "hc_collapse", "hc_expand", "hc_head", "hisa_select",
           "pooled_refresh", "v4_rope", "v4_rope_rates",
           "sparse_pooled_attention", "DeepseekV4Cache"]
