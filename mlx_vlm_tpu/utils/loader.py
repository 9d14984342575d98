"""Model loading: HF checkpoints -> jax parameter pytrees.

Role parity: reference `mlx_vlm/utils.py` — load:758, load_model:464,
get_model_and_args:372, get_model_path:425, load_config:868,
_load_safetensors:683, MODEL_REMAPPING:32.

TPU design: safetensors are read to host numpy, sanitized per model family,
optionally folded into group-affine `QuantizedTensor`s (mlx quantized
checkpoints import directly), then **per-layer weights are stacked along a
leading axis** so decoder blocks run under `lax.scan` — one compile for all
layers, and the whole stack is a handful of HBM buffers.
"""

from __future__ import annotations

import glob
import importlib
import json
import logging
import re
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.quant import (
    ChannelQuantizedTensor,
    Int4GroupedTensor,
    NVFP4Tensor,
    QuantizedTensor,
    from_mlx_packed,
    to_channel_quantized,
    to_int4_grouped,
)

logger = logging.getLogger("mlx_vlm_tpu.loader")

# model_type -> module name overrides (reference utils.py:32)
MODEL_REMAPPING = {
    "rf-detr": "rfdetr",
    "sam3_video": "sam3",
    "llava-qwen2": "llava_bunny",
    "llava_qwen2": "llava_bunny",
    "bunny-llama": "llava_bunny",
    "lfm2-vl": "lfm2_vl",
    "qwen2_5_vl": "qwen2_5_vl",
    "smolvlm": "idefics3",
    "llava_next": "llava",  # CLIP tower + llama decoder path
    "qwen3_moe": "qwen2_moe",  # same MoE decoder; q/k norms picked up
    "deepseek_v3": "deepseek_v2",  # MLA + noaux_tc routing in one module
    "mistral4": "deepseek_v2",  # MLA + softmax-topk MoE, same key layout
    "qwen3_5_moe": "qwen3_5",  # same hybrid decoder; MoE via experts keys
    "deepseekocr": "deepseekocr",
    "deepseekocr_2": "deepseekocr",  # same SAM+CLIP towers, newer decoder
    "unlimited-ocr": "deepseekocr",  # deepseekocr.language-based (ref)
    "unlimited_ocr": "deepseekocr",
    "phi3": "phi3_v",  # same decoder; vision path simply unused
    "cohere": "cohere2",
    "nemotron-nas": "nemotron_nas",  # HF model_type has a hyphen
    "phi4-siglip": "phi4_siglip",
    "jvlm": "jina_vlm",  # reference utils.py:38
    "nemotronh_nano_omni_reasoning_v3": "nemotron_h_nano_omni",
    "phi3small": "phi3small",
    "phi3_small": "phi3small",
    "hunyuan_v1_moe": "hunyuan",
    "hunyuan_moe": "hunyuan",
    "solar_open": "glm4_moe",  # reference solar_open reuses glm4_moe
    # plain-llama-architecture text families (biases/norm variants are
    # picked up from the checkpoint keys directly)
    "qwen3": "llama",  # qk-norm + head_dim picked up from keys/config
    "qwen2": "llama",  # text-only qwen2 checkpoints (biases via keys)
    "ernie4_5": "llama",
    "helium": "llama",
    "seed_oss": "llama",
    "internlm3": "llama",
    "telechat3": "llama",
}


def get_model_path(path_or_hf_repo: str, revision: Optional[str] = None) -> Path:
    p = Path(path_or_hf_repo)
    if p.exists():
        return p
    try:
        from huggingface_hub import snapshot_download

        return Path(
            snapshot_download(
                repo_id=path_or_hf_repo,
                revision=revision,
                allow_patterns=[
                    "*.json", "*.safetensors", "*.py", "tokenizer.model",
                    "*.tiktoken", "*.txt", "*.jinja",
                ],
            )
        )
    except Exception as e:  # pragma: no cover - network-dependent
        raise FileNotFoundError(
            f"Model path {path_or_hf_repo} not found locally and hub download "
            f"failed: {e}"
        ) from e


def load_config(model_path: Path) -> dict:
    """config.json + generation_config.json merge (reference utils.py:868:
    eos_token_id and sampling defaults live in generation_config)."""
    with open(model_path / "config.json") as f:
        config = json.load(f)
    gen_cfg_path = model_path / "generation_config.json"
    if gen_cfg_path.exists():
        try:
            with open(gen_cfg_path) as f:
                gen = json.load(f)
            for k in ("eos_token_id", "bos_token_id", "pad_token_id"):
                if k in gen and k not in config:
                    config[k] = gen[k]
        except (json.JSONDecodeError, OSError):
            pass
    return config


def get_model_and_args(config: dict):
    model_type = config["model_type"]
    model_type = MODEL_REMAPPING.get(model_type, model_type)
    try:
        arch = importlib.import_module(f"mlx_vlm_tpu.models.{model_type}")
    except ImportError as e:
        from ..models import text_only

        if text_only.is_text_only_config(config):
            return text_only, model_type
        raise ValueError(f"Model type {model_type} not supported: {e}") from e
    return arch, model_type


# --------------------------------------------------------------------------
# weight tree assembly


def _nest(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def _stack_layers(flat: dict, patterns) -> dict:
    """Fold `prefix.{i}.rest` keys into stacked arrays keyed `prefix.rest`.

    Patterns are applied in order; an entry may be `(prefix, dest_axis)` to
    move the new stacked axis (e.g. per-layer expert stacks become
    [L, E, ...] by stacking experts after layers with dest_axis=1)."""
    for pat in patterns:
        if isinstance(pat, (tuple, list)):
            pref, dest = pat
        else:
            pref, dest = pat, 0
        pr = re.compile(rf"^{re.escape(pref)}\.(\d+)\.(.+)$")
        out = {}
        groups: dict = {}
        for k, v in flat.items():
            m = pr.match(k)
            if m:
                idx, rest = int(m.group(1)), m.group(2)
                groups.setdefault(rest, {})[idx] = v
            else:
                out[k] = v
        for rest, items in groups.items():
            vals = [items[i] for i in sorted(items)]
            if len(vals) != max(items) + 1:
                raise ValueError(f"missing indices under {pref}.*.{rest}")
            if isinstance(vals[0], QuantizedTensor):
                stacked = QuantizedTensor(
                    q=np.moveaxis(np.stack([t.q for t in vals]), 0, dest),
                    scales=np.moveaxis(np.stack([t.scales for t in vals]), 0, dest),
                    biases=np.moveaxis(np.stack([t.biases for t in vals]), 0, dest),
                    bits=vals[0].bits,
                    group_size=vals[0].group_size,
                    out_dtype=vals[0].out_dtype,
                )
            elif isinstance(vals[0], Int4GroupedTensor):
                # always stacked on the LEADING axis: ops/int4_matvec.py
                # flattens [L, K, N2p] -> [L*K, N2p] for layer indexing.
                # CRITICAL: stack numpy leaves with numpy — jnp.stack here
                # uploads every layer to device BEFORE the host-side fused
                # pack build can see numpy leaves, forcing the pack relayout
                # on device (per-linear copy + pack + ~4 GB of transients at
                # 7B = async RESOURCE_EXHAUSTED on a 16 GiB chip).
                xs = np if isinstance(vals[0].qp, np.ndarray) else jnp
                stacked = Int4GroupedTensor(
                    qp=xs.stack([t.qp for t in vals]),
                    sl=xs.stack([t.sl for t in vals]),
                    sh=xs.stack([t.sh for t in vals]),
                    bl=xs.stack([t.bl for t in vals]),
                    bh=xs.stack([t.bh for t in vals]),
                    n=vals[0].n,
                    group_size=vals[0].group_size,
                    out_dtype=vals[0].out_dtype,
                )
            elif isinstance(vals[0], NVFP4Tensor):
                xs = np if isinstance(vals[0].q, np.ndarray) else jnp
                stacked = NVFP4Tensor(
                    q=xs.moveaxis(xs.stack([t.q for t in vals]), 0, dest),
                    scales=xs.moveaxis(
                        xs.stack([t.scales for t in vals]), 0, dest),
                    out_dtype=vals[0].out_dtype,
                )
            elif isinstance(vals[0], ChannelQuantizedTensor):
                stacked = ChannelQuantizedTensor(
                    q8=np.moveaxis(np.stack([t.q8 for t in vals]), 0, dest),
                    scales=np.moveaxis(
                        np.stack([t.scales for t in vals]), 0, dest
                    ),
                    biases=np.moveaxis(
                        np.stack([t.biases for t in vals]), 0, dest
                    ),
                    src_bits=vals[0].src_bits,
                    out_dtype=vals[0].out_dtype,
                )
            else:
                stacked = np.moveaxis(np.stack(vals), 0, dest)
            out[f"{pref}.{rest}"] = stacked
        flat = out
    return flat


def unstack_params(model, params: dict) -> dict:
    """Inverse of the load pipeline's layer stacking: nested scan-stacked
    params -> flat HF-named numpy dict (for checkpoint saving after
    full finetuning).  Patterns invert in reverse order so nested stacks
    (per-layer expert axes) unfold correctly."""
    import numpy as _np

    import jax as _jax

    lp = params.get("language_model") if isinstance(params, dict) else None
    if (isinstance(lp, dict) and "fused_decode" in lp
            and isinstance(lp.get("model"), dict)
            and "layers" not in lp["model"]):
        # pack-only load: rebuild the per-linear stacked tree so the flat
        # HF-named export walks real layer weights (not the pack relayout)
        from ..ops.fused_decode import stacked_params_from_pack

        lp = dict(lp)
        lp["model"] = {**lp["model"],
                       "layers": stacked_params_from_pack(lp["fused_decode"])}
        lp.pop("fused_decode")
        params = {**params, "language_model": lp}
    elif isinstance(lp, dict) and "fused_decode" in lp:
        lp = {k: v for k, v in lp.items() if k != "fused_decode"}
        params = {**params, "language_model": lp}

    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            elif isinstance(v, (QuantizedTensor, ChannelQuantizedTensor,
                                NVFP4Tensor, Int4GroupedTensor)):
                raise ValueError(
                    f"cannot export quantized tensor at {path}; dequantize "
                    "before saving or use the converter")
            else:
                flat[path] = _np.asarray(_jax.device_get(v))

    walk(params)
    for pat in reversed(tuple(model.stack_patterns)):
        pref, dest = pat if isinstance(pat, (tuple, list)) else (pat, 0)
        out = {}
        for k, v in flat.items():
            if k.startswith(pref + "."):
                rest = k[len(pref) + 1:]
                for i in range(v.shape[dest]):
                    out[f"{pref}.{i}.{rest}"] = _np.take(v, i, axis=dest)
            else:
                out[k] = v
        flat = out
    return flat


def runtime_quant_mode(default: str = "w8chan") -> str:
    """How quantized weights execute on device.

    "w4grp" (default for int4 checkpoints whose language model supports
    the whole-stack fused decode kernel): keep the checkpoint's
    group-affine int4 codes BIT-EXACT in the halves-packed layout
    (core/quant.py Int4GroupedTensor).  Decode streams every weight byte
    of the step through ONE Pallas call (ops/fused_decode.py) — measured
    7.3 ms/step on Qwen2-VL-7B dims (~136 tok/s) vs 10.0 ms for w8chan,
    because it reads half the weight bytes on a bandwidth-bound step.
    Models without the fused path fall back to the per-linear kernel
    (ops/int4_matvec.py), which loses to w8chan on launch overhead — so
    "auto" only picks w4grp when the fused pack will actually attach.
    "w8chan" (default otherwise): requantize group-affine weights to
    per-channel int8 in transposed [K, N] layout.  XLA fuses the bare
    int8->bf16 convert into the matvec (scales factor out to the
    output), so decode runs at the int8 HBM roofline — measured
    ~700 GB/s effective on v5e.
    "exact": keep group-affine codes and dequantize at matmul time
    (Pallas fused kernel / XLA dequant).

    MLX_VLM_TPU_RUNTIME_QUANT overrides the automatic choice.
    """
    import os

    mode = os.environ.get("MLX_VLM_TPU_RUNTIME_QUANT", "") or default
    if mode not in ("w4grp", "w8chan", "exact"):
        raise ValueError(
            f"MLX_VLM_TPU_RUNTIME_QUANT must be w4grp|w8chan|exact, "
            f"got {mode}")
    return mode


def _fold_quantized(flat: dict, qcfg: dict,
                    default_mode: str = "w8chan") -> dict:
    """Fold mlx-style (weight: packed uint32, scales, biases) triples into
    QuantizedTensor leaves.  Reference: nn.quantize at utils.py:657 and
    quantized checkpoint loading."""
    bits = qcfg.get("bits", 4)
    group_size = qcfg.get("group_size", 64)
    mode = runtime_quant_mode(default_mode)
    out = {}
    handled = set()
    for k in list(flat.keys()):
        if not k.endswith(".scales"):
            continue
        base = k[: -len(".scales")]
        wk, bk = base + ".weight", base + ".biases"
        if wk not in flat:
            continue
        # per-path overrides are keyed by CHECKPOINT names; sanitize() may
        # have wrapped them (e.g. language_model. prefix), so probe with
        # leading components progressively stripped
        probe = base
        per = qcfg.get(probe, None)
        while per is None and "." in probe:
            probe = probe.split(".", 1)[1]
            per = qcfg.get(probe, None)
        b, g = bits, group_size
        if isinstance(per, dict):
            b, g = per.get("bits", bits), per.get("group_size", group_size)
        if per is False:
            continue
        w = flat[wk]
        if w.dtype != np.uint32:
            continue
        biases = flat.get(bk)
        if biases is None:
            biases = np.zeros_like(flat[k])
        qt = from_mlx_packed(w, flat[k], biases, b, g)
        # embedding tables need gather access -> channel layout always
        is_embed = "embed_tokens" in base or "wte" in base
        if (mode == "w4grp" and b == 4 and qt.q.ndim == 2
                and not is_embed and (qt.q.shape[1] * 2) % g == 0):
            qt = to_int4_grouped(qt)
        elif mode in ("w8chan", "w4grp") and qt.q.ndim == 2:
            qt = to_channel_quantized(qt)
        out[wk] = qt
        handled.update({wk, k, bk})
    for k, v in flat.items():
        if k not in handled:
            out.setdefault(k, v)
    return out


def _to_device(flat: dict, dtype, zeros_on_device: bool = False) -> dict:
    def put(v):
        if zeros_on_device and not isinstance(
            v, (QuantizedTensor, ChannelQuantizedTensor, Int4GroupedTensor,
                NVFP4Tensor)
        ):
            v = np.asarray(v)
            if np.issubdtype(v.dtype, np.floating):
                # benchmark path: materialize on device, skip host transfer
                return jnp.zeros(v.shape, dtype)
            return jnp.asarray(v)
        if isinstance(v, ChannelQuantizedTensor):
            if zeros_on_device:
                return ChannelQuantizedTensor(
                    q8=jnp.zeros(v.q8.shape, jnp.int8),
                    scales=jnp.zeros(v.scales.shape, dtype),
                    biases=jnp.zeros(v.biases.shape, dtype),
                    src_bits=v.src_bits,
                    out_dtype=jnp.dtype(dtype).name,
                )
            return ChannelQuantizedTensor(
                q8=jnp.asarray(v.q8),
                scales=jnp.asarray(v.scales, dtype=dtype),
                biases=jnp.asarray(v.biases, dtype=dtype),
                src_bits=v.src_bits,
                out_dtype=jnp.dtype(dtype).name,
            )
        if isinstance(v, Int4GroupedTensor):
            if zeros_on_device:
                return Int4GroupedTensor(
                    qp=jnp.zeros(v.qp.shape, jnp.uint8),
                    sl=jnp.zeros(v.sl.shape, jnp.float32),
                    sh=jnp.zeros(v.sh.shape, jnp.float32),
                    bl=jnp.zeros(v.bl.shape, jnp.float32),
                    bh=jnp.zeros(v.bh.shape, jnp.float32),
                    n=v.n, group_size=v.group_size,
                    out_dtype=jnp.dtype(dtype).name,
                )
            return Int4GroupedTensor(
                qp=jnp.asarray(v.qp),
                sl=jnp.asarray(v.sl, jnp.float32),
                sh=jnp.asarray(v.sh, jnp.float32),
                bl=jnp.asarray(v.bl, jnp.float32),
                bh=jnp.asarray(v.bh, jnp.float32),
                n=v.n, group_size=v.group_size,
                out_dtype=jnp.dtype(dtype).name,
            )
        if isinstance(v, NVFP4Tensor):
            return NVFP4Tensor(
                q=jnp.asarray(v.q),
                scales=jnp.asarray(v.scales),
                out_dtype=jnp.dtype(dtype).name,
            )
        if isinstance(v, QuantizedTensor):
            return QuantizedTensor(
                q=jnp.asarray(v.q),
                scales=jnp.asarray(v.scales, dtype=dtype),
                biases=jnp.asarray(v.biases, dtype=dtype),
                bits=v.bits,
                group_size=v.group_size,
                out_dtype=jnp.dtype(dtype).name,
            )
        v = np.asarray(v)
        if np.issubdtype(v.dtype, np.floating) or v.dtype == jnp.bfloat16:
            return jnp.asarray(v, dtype=dtype)
        return jnp.asarray(v)

    return {k: put(v) for k, v in flat.items()}


def _raw_uint8_tensor(path: str, key: str) -> "np.ndarray":
    """Read one tensor's raw bytes as uint8 (for dtypes numpy can't map,
    e.g. F8_E8M0).  Shape is the declared shape with the last dim scaled by
    bytes-per-element, so a later reinterpret (np.view) stays possible."""
    import json
    import struct

    with open(path, "rb") as fh:
        (hlen,) = struct.unpack("<Q", fh.read(8))
        header = json.loads(fh.read(hlen))
        meta = header[key]
        start, end = meta["data_offsets"]
        fh.seek(8 + hlen + start)
        raw = np.frombuffer(fh.read(end - start), dtype=np.uint8)
    shape = list(meta["shape"])
    if shape:
        lead = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
        shape[-1] = raw.size // max(lead, 1)
    else:
        shape = [raw.size]
    return raw.reshape(shape)


def _read_safetensors(model_path: Path) -> dict:
    from safetensors import safe_open

    files = sorted(glob.glob(str(model_path / "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"No safetensors found in {model_path}")
    weights = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                try:
                    weights[k] = sf.get_tensor(k)
                except Exception:
                    # unsupported dtype (e.g. F8_E8M0) — reload the raw bytes
                    # as a uint8 view so sanitize()/quant-fold can reinterpret
                    # (reference utils.py:58 patches these the same way)
                    weights[k] = _raw_uint8_tensor(f, k)
                    logger.warning(
                        "tensor %s has unsupported dtype; loaded raw as uint8",
                        k,
                    )
        # bf16 comes back as ml_dtypes.bfloat16 — fine for np.stack/jnp.asarray
    return weights


def _transform_compressed_tensors(weights: dict, qc: dict):
    """Fold compressed-tensors checkpoints into native quantized leaves
    (reference utils.py:158-291) — runs BEFORE model sanitization so the
    family renames see ordinary .weight keys.

    - `nvfp4-pack-quantized`: E2M1 codes kept bit-exact as NVFP4Tensor; the
      per-tensor global scale divides into the decoded E4M3 group scales.
    - `pack-quantized` int: symmetric int4/8 words reinterpret bit-identical
      to the mlx affine layout with bias = -2^(b-1) * scale; returns an
      affine qcfg for the shared fold.
    """
    from ..core.quant import from_compressed_nvfp4

    if not any(k.endswith(".weight_packed") for k in weights):
        return weights, None
    grp = (qc.get("config_groups", {}).get("group_0", {}) or {})
    wcfg = grp.get("weights", {}) or {}
    fmt = qc.get("format") or grp.get("format")
    out = {}
    if fmt == "nvfp4-pack-quantized":
        for k, v in weights.items():
            if k.endswith(".weight_packed"):
                p = k[: -len(".weight_packed")]
                out[f"{p}.weight"] = from_compressed_nvfp4(
                    np.asarray(v, np.uint8).view(np.uint8),
                    np.asarray(weights[f"{p}.weight_scale"]).view(np.uint8),
                    np.asarray(weights[f"{p}.weight_global_scale"],
                               np.float32),
                )
            elif k.endswith((".weight_scale", ".weight_global_scale")):
                continue
            else:
                out[k] = v
        return out, {"mode": "nvfp4", "bits": 4, "group_size": 16}
    if fmt == "pack-quantized" and wcfg.get("type") == "int":
        bits = int(wcfg.get("num_bits", 4))
        group_size = int(wcfg.get("group_size", 32))
        for k, v in weights.items():
            if k.endswith(".weight_packed"):
                p = k[: -len(".weight_packed")]
                scale = np.asarray(weights[f"{p}.weight_scale"])
                out[f"{p}.weight"] = np.asarray(v).view(np.uint32)
                out[f"{p}.scales"] = scale
                out[f"{p}.biases"] = (-(2 ** (bits - 1)) * scale).astype(
                    scale.dtype)
            elif k.endswith((".weight_scale", ".weight_shape")):
                continue
            else:
                out[k] = v
        return out, {"mode": "affine", "bits": bits, "group_size": group_size}
    logger.warning("unsupported compressed-tensors format %r; loading raw",
                   fmt)
    return weights, None


def load_model_from_weights(
    config: dict, weights: dict, dtype=jnp.bfloat16, zeros_on_device: bool = False
):
    """Full load pipeline from an in-memory flat weight dict (HF keys)."""
    arch, _ = get_model_and_args(config)
    model_config = arch.ModelConfig.from_dict(config)
    model = arch.Model(model_config)
    qc = config.get("quantization_config") or {}
    if qc.get("quant_method") == "compressed-tensors":
        weights, folded = _transform_compressed_tensors(weights, qc)
        if folded and folded.get("mode") == "affine":
            config = {**config,
                      "quantization": {**(config.get("quantization") or {}),
                                       "bits": folded["bits"],
                                       "group_size": folded["group_size"]}}
    if hasattr(model, "sanitize"):
        weights = model.sanitize(weights)
    qcfg = config.get("quantization")
    if qcfg:
        # int4 checkpoints whose LM has the whole-stack fused decode path
        # default to the bit-exact w4grp layout (reads half the bytes of
        # the int8 fallback on the bandwidth-bound decode step)
        lm = getattr(model, "language_model", None)
        fused_ok = (
            getattr(lm, "supports_fused_decode", False)
            and qcfg.get("bits", 4) == 4
        )
        weights = _fold_quantized(
            weights, qcfg, default_mode="w4grp" if fused_ok else "w8chan"
        )
    weights = _stack_layers(weights, tuple(model.stack_patterns))
    # fused-decode pack: relayout on HOST while the weights are numpy —
    # building it from device arrays would spike HBM with ~4 GB of
    # concat/transpose transients on top of the resident model (OOM at 7B)
    host_pack = _build_host_fused_pack(weights, model)
    if host_pack is not None:
        # The pack carries every layer tensor; uploading the per-linear
        # copies too would DOUBLE layer residency (3.8 GiB each at 7B —
        # the difference between fitting and OOM on a 16 GiB chip).
        # Non-fused forwards rebuild per-layer weights from pack slices
        # (models/qwen2_vl/language.py pack-weights scan).  Set
        # MLX_VLM_TPU_KEEP_LAYERS=1 to keep both (e.g. to favor the
        # per-linear scalar-prefetch kernel for batched decode).
        import os as _os

        if _os.environ.get("MLX_VLM_TPU_KEEP_LAYERS", "0") not in (
                "1", "true"):
            weights = _drop_pack_covered_layers(weights) or weights
    params = _nest(_to_device(weights, dtype, zeros_on_device))
    model.params = params
    model.config_dict = config
    if host_pack is not None:
        model.params["language_model"]["fused_decode"] = (
            jax.tree_util.tree_map(jnp.asarray, host_pack))
    else:
        _maybe_attach_fused_decode(model)
    return model


_PACK_COVERED_SUFFIXES = frozenset({
    "input_layernorm.weight", "post_attention_layernorm.weight",
    "self_attn.q_proj.weight", "self_attn.k_proj.weight",
    "self_attn.v_proj.weight", "self_attn.o_proj.weight",
    "self_attn.q_proj.bias", "self_attn.k_proj.bias",
    "self_attn.v_proj.bias",
    "mlp.gate_proj.weight", "mlp.up_proj.weight", "mlp.down_proj.weight",
})


def _layers_pack_covered(layers: dict) -> bool:
    """True when every leaf under a NESTED layers dict is pack-covered."""
    flat = []

    def walk(d, pfx):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, pfx + k + ".")
            else:
                flat.append(pfx + k)

    walk(layers, "")
    return all(s in _PACK_COVERED_SUFFIXES for s in flat)


def _drop_pack_covered_layers(flat_weights: dict):
    """Remove stacked LM layer tensors that the fused pack carries.

    Only drops when the pack covers EVERY key under the layers prefix —
    a partial drop would leave a layers subtree the scan body can't run.
    Returns the reduced dict, or None to keep everything."""
    prefix = "language_model.model.layers."
    layer_keys = [k for k in flat_weights if k.startswith(prefix)]
    if not layer_keys:
        return None
    if any(k[len(prefix):] not in _PACK_COVERED_SUFFIXES
           for k in layer_keys):
        return None
    return {k: v for k, v in flat_weights.items()
            if not k.startswith(prefix)}


def _build_host_fused_pack(flat_weights: dict, model):
    """Host-side (numpy) fused pack build; None when not applicable."""
    import os

    import numpy as np

    if os.environ.get("MLX_VLM_TPU_FUSED_DECODE", "1") in ("0", "false"):
        return None
    lm = getattr(model, "language_model", None)
    if lm is None or not getattr(lm, "supports_fused_decode", False):
        return None
    args = getattr(lm, "args", None)
    if args is None or not hasattr(args, "num_key_value_heads"):
        return None
    host = _nest(flat_weights)  # view: shares leaf references, no copies
    lp = host.get("language_model")
    if not isinstance(lp, dict) or "model" not in lp:
        return None
    # only build host-side from numpy leaves; device leaves fall through
    # to _maybe_attach_fused_decode
    try:
        w = lp["model"]["layers"]["mlp"]["gate_proj"]["weight"]
    except (KeyError, TypeError):
        return None
    from ..core.quant import Int4GroupedTensor

    if not (isinstance(w, Int4GroupedTensor)
            and isinstance(w.qp, np.ndarray)):
        return None
    try:
        from ..ops.fused_decode import build_fused_pack

        lm_head = None if getattr(args, "tie_word_embeddings", False) \
            else (lp.get("lm_head") or {}).get("weight")
        final_norm = (lp["model"].get("norm") or {}).get("weight")
        return build_fused_pack(lp["model"], args, lm_head=lm_head,
                                final_norm=final_norm)
    except Exception:
        return None


def _maybe_attach_fused_decode(model) -> None:
    """Build the whole-stack fused-decode weight pack (ops/fused_decode.py)
    when the language model's layer linears are stacked Int4GroupedTensor
    (w4grp mode).  The pack rides inside params so it reaches jitted decode
    programs as an argument, never as a baked-in constant."""
    import os

    if os.environ.get("MLX_VLM_TPU_FUSED_DECODE", "1") in ("0", "false"):
        return
    lm = getattr(model, "language_model", None)
    lp = model.params.get("language_model") if isinstance(
        model.params, dict) else None
    if lm is None or not isinstance(lp, dict) or "model" not in lp:
        return
    if not getattr(lm, "supports_fused_decode", False):
        return
    args = getattr(lm, "args", None)
    if args is None or not hasattr(args, "num_key_value_heads"):
        return
    try:
        from ..ops.fused_decode import build_fused_pack

        lm_head = None if getattr(args, "tie_word_embeddings", False) \
            else (lp.get("lm_head") or {}).get("weight")
        final_norm = (lp["model"].get("norm") or {}).get("weight")
        pack = build_fused_pack(lp["model"], args, lm_head=lm_head,
                                final_norm=final_norm)
    except Exception:
        return
    if pack is not None:
        lp["fused_decode"] = pack
        # pack-only residency (mirrors _drop_pack_covered_layers on the
        # host path): the pack carries every layer tensor, so drop the
        # per-linear copies — their device buffers free once unreferenced
        if os.environ.get("MLX_VLM_TPU_KEEP_LAYERS", "0") not in (
                "1", "true"):
            layers = lp["model"].get("layers")
            if isinstance(layers, dict) and _layers_pack_covered(layers):
                lp["model"].pop("layers")


def ensure_layer_params(model, drop_pack: bool = False) -> None:
    """Rematerialize per-linear LM layer params from the fused pack.

    Pack-only loads (the int4 default) keep the fused-decode pack as the
    sole copy of the layer linears.  Consumers that walk per-linear paths
    — TP sharding (parallel/shard.py partition rules), LoRA/DoRA attach,
    convert roundtrips, unstack_params — call this first: it rebuilds the
    stacked Int4GroupedTensor tree host-side (bit-exact inverse relayout,
    ops/fused_decode.py stacked_params_from_pack) and inserts it at
    params["language_model"]["model"]["layers"].  drop_pack=True also
    removes the pack (e.g. sharded runs, where the single-chip fused
    kernel does not apply and double residency would waste HBM).
    No-op when layers already exist."""
    lp = model.params.get("language_model") if isinstance(
        model.params, dict) else None
    if not isinstance(lp, dict) or "fused_decode" not in lp:
        return
    mdl = lp.get("model")
    if not isinstance(mdl, dict):
        return
    if "layers" not in mdl:
        from ..ops.fused_decode import stacked_params_from_pack

        mdl["layers"] = stacked_params_from_pack(lp["fused_decode"])
    if drop_pack:
        lp.pop("fused_decode", None)


def load_model(
    model_path,
    lazy: bool = False,
    strict: bool = True,
    dtype=jnp.bfloat16,
    **kwargs,
):
    """Instantiate the model class and attach its parameter pytree."""
    model_path = Path(model_path)
    config = load_config(model_path)
    weights = _read_safetensors(model_path)
    return load_model_from_weights(config, weights, dtype)


def load(
    path_or_hf_repo: str,
    processor_kwargs: Optional[dict] = None,
    dtype=jnp.bfloat16,
    **kwargs,
):
    """Load (model, processor) — reference utils.py:758."""
    model_path = get_model_path(path_or_hf_repo)
    model = load_model(model_path, dtype=dtype, **kwargs)
    from .processing import load_processor

    processor = load_processor(model_path, model, **(processor_kwargs or {}))
    return model, processor
