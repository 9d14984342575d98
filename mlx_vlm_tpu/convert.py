"""Checkpoint conversion: HF -> framework layout, optional quantization.

Role parity: reference mlx_vlm/convert.py — convert:145 (dtype cast,
affine quantization with per-layer predicate, shard writing, model card),
mixed_quant_predicate_builder:74, save_weights utils.py:1112 (5 GB shards +
safetensors index).

Output stays loadable by both this framework and mlx-style loaders: 4/8-bit
weights are packed little-endian into uint32 rows with sibling
`.scales`/`.biases` tensors and a `quantization` block in config.json.
"""

from __future__ import annotations

import argparse
import glob
import re
import json
import shutil
from pathlib import Path
from typing import Callable, Optional

import numpy as np

MAX_SHARD_BYTES = 5_368_709_120  # 5 GB shards (reference utils.py:983)


def _quantize_affine_packed(w: np.ndarray, bits: int, group_size: int):
    """[out, in] float -> (packed uint32 [out, in*bits/32], scales, biases)."""
    out_d, in_d = w.shape
    g = group_size
    wg = w.reshape(out_d, in_d // g, g).astype(np.float32)
    mn = wg.min(-1)
    mx = wg.max(-1)
    scale = (mx - mn) / (2**bits - 1)
    scale[scale == 0] = 1.0
    q = np.clip(np.round((wg - mn[..., None]) / scale[..., None]), 0, 2**bits - 1)
    q = q.astype(np.uint32).reshape(out_d, in_d)
    per_word = 32 // bits
    packed = np.zeros((out_d, in_d // per_word), np.uint32)
    for j in range(per_word):
        packed |= q[:, j::per_word] << (bits * j)
    return packed, scale.astype(np.float16), mn.astype(np.float16)


def default_quant_predicate(skip_vision: bool = True) -> Callable[[str, np.ndarray], bool]:
    """Eligibility (reference get_class_predicate utils.py:351): 2-D linear
    weights, inner dim % 64 == 0, vision/audio towers skipped by default."""

    def pred(key: str, w: np.ndarray) -> bool:
        if not key.endswith(".weight") or w.ndim != 2:
            return False
        if "norm" in key or "embed_tokens" in key:
            return False
        if skip_vision and any(
            s in key for s in ("visual", "vision_tower", "audio", "multi_modal_projector", "merger", "patch_embed")
        ):
            return False
        return w.shape[1] % 64 == 0

    return pred


MIXED_RECIPES = {
    # reference convert.py:74 mixed_quant_predicate_builder (Q4_K_M-style
    # low/high splits).  TPU packing is byte-aligned: odd reference widths
    # round UP to the next runtime-supported width {2, 4, 8} (more bpw,
    # never less quality).
    "mixed_2_4": (2, 4),
    "mixed_2_6": (2, 8),
    "mixed_2_8": (2, 8),
    "mixed_3_4": (4, 4),
    "mixed_3_5": (4, 8),
    "mixed_3_6": (4, 8),
    "mixed_3_8": (4, 8),
    "mixed_4_6": (4, 8),
    "mixed_4_8": (4, 8),
}


def mixed_quant_predicate_builder(recipe: str, config: dict,
                                  group_size: int = 64,
                                  skip_vision: bool = True) -> Callable:
    """llama.cpp-Q4_K_M-style mixed predicate (reference convert.py:74):
    first/last eighth of layers, every 3rd in between, plus v_proj /
    down_proj there and lm_head/embed_tokens everywhere get high bits.
    Returns {bits, group_size} per key (dict predicate protocol)."""
    if recipe not in MIXED_RECIPES:
        raise ValueError(
            f"Invalid quant recipe {recipe}; known: {sorted(MIXED_RECIPES)}")
    low_bits, high_bits = MIXED_RECIPES[recipe]
    tc = config.get("text_config") or config
    num_layers = int(tc.get("num_hidden_layers", 0))
    base_ok = default_quant_predicate(skip_vision)
    layer_re = re.compile(r"\.layers\.(\d+)\.")

    def pred(key: str, w) -> object:
        quantize_embed = ("embed_tokens" in key and key.endswith(".weight")
                          and getattr(w, "ndim", 0) == 2
                          and w.shape[1] % group_size == 0)
        if not base_ok(key, w) and not quantize_embed:
            return False
        if "lm_head" in key or "embed_tokens" in key:
            return {"bits": high_bits, "group_size": group_size}
        m = layer_re.search(key)
        index = int(m.group(1)) if m else 0
        use_more = (
            num_layers > 0
            and (index < num_layers // 8
                 or index >= 7 * num_layers // 8
                 or (index - num_layers // 8) % 3 == 2))
        if use_more and ("v_proj" in key or "down_proj" in key):
            return {"bits": high_bits, "group_size": group_size}
        return {"bits": low_bits, "group_size": group_size}

    return pred


def save_weights(out_dir: Path, weights: dict):
    """Sharded safetensors writer + index (reference utils.py:1112)."""
    from safetensors.numpy import save_file

    out_dir.mkdir(parents=True, exist_ok=True)
    shards = []
    cur, cur_bytes = {}, 0
    for k, v in weights.items():
        nb = v.nbytes
        if cur and cur_bytes + nb > MAX_SHARD_BYTES:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += nb
    if cur:
        shards.append(cur)
    index = {"metadata": {"total_size": sum(v.nbytes for v in weights.values())}, "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        name = (
            "model.safetensors"
            if n == 1
            else f"model-{i+1:05d}-of-{n:05d}.safetensors"
        )
        save_file(shard, str(out_dir / name))
        for k in shard:
            index["weight_map"][k] = name
    if n > 1:
        with open(out_dir / "model.safetensors.index.json", "w") as f:
            json.dump(index, f, indent=2)


def convert(
    hf_path: str,
    tpu_path: str = "tpu_model",
    quantize: bool = False,
    q_bits: int = 4,
    q_group_size: int = 64,
    dtype: str = "bfloat16",
    skip_vision: bool = True,
    quant_predicate: Optional[Callable] = None,
):
    """Reference convert.py:145."""
    import ml_dtypes
    from safetensors import safe_open

    from .utils.loader import get_model_path, load_config

    src = get_model_path(hf_path)
    dst = Path(tpu_path)
    dst.mkdir(parents=True, exist_ok=True)
    config = load_config(src)

    np_dtype = {"bfloat16": ml_dtypes.bfloat16, "float16": np.float16,
                "float32": np.float32}[dtype]
    pred = quant_predicate or default_quant_predicate(skip_vision)

    weights = {}
    for f in sorted(glob.glob(str(src / "*.safetensors"))):
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                weights[k] = sf.get_tensor(k)

    out = {}
    n_quantized = 0
    total_bits = 0
    total_params = 0
    per_path: dict = {}
    for k, v in weights.items():
        if np.issubdtype(v.dtype, np.floating) or v.dtype == ml_dtypes.bfloat16:
            total_params += v.size
            verdict = pred(k, v) if quantize else False
            if verdict:
                # dict verdicts carry per-tensor bits/group (mixed recipes,
                # reference convert.py mixed_quant_predicate)
                b = q_bits
                g = q_group_size
                if isinstance(verdict, dict):
                    b = int(verdict.get("bits", q_bits))
                    g = int(verdict.get("group_size", q_group_size))
                packed, scales, biases = _quantize_affine_packed(
                    v.astype(np.float32), b, g
                )
                base = k[: -len(".weight")]
                out[k] = packed
                out[base + ".scales"] = scales
                out[base + ".biases"] = biases
                n_quantized += 1
                total_bits += v.size * b
                if b != q_bits or g != q_group_size:
                    per_path[base] = {"bits": b, "group_size": g}
            else:
                out[k] = v.astype(np_dtype)
                total_bits += v.size * np.dtype(np_dtype).itemsize * 8
        else:
            out[k] = v

    if quantize:
        config["quantization"] = {
            "bits": q_bits, "group_size": q_group_size, **per_path}
        bpw = total_bits / max(total_params, 1)
        print(f"quantized {n_quantized} tensors; {bpw:.2f} bits per weight")

    save_weights(dst, out)
    with open(dst / "config.json", "w") as f:
        json.dump(config, f, indent=2)
    for extra in src.glob("*.json"):
        if extra.name not in ("config.json",) and not extra.name.startswith("model"):
            shutil.copy(extra, dst / extra.name)
    for extra in ("tokenizer.model", "merges.txt", "vocab.txt"):
        p = src / extra
        if p.exists():
            shutil.copy(p, dst / extra)
    print(f"converted -> {dst}")
    return dst


def main(argv=None):
    p = argparse.ArgumentParser("mlx_vlm_tpu convert")
    p.add_argument("--hf-path", required=True)
    p.add_argument("--tpu-path", "--mlx-path", dest="tpu_path", default="tpu_model")
    p.add_argument("-q", "--quantize", action="store_true")
    p.add_argument("--q-bits", type=int, default=4)
    p.add_argument("--q-group-size", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--keep-vision", action="store_true",
                   help="quantize vision/audio towers too")
    p.add_argument("--quant-predicate", default=None,
                   help="mixed recipe name (mixed_2_4/mixed_4_8/... — "
                        "reference convert.py --quant-predicate)")
    args = p.parse_args(argv)
    quant_predicate = None
    if args.quant_predicate:
        from .utils.loader import get_model_path, load_config

        cfg = load_config(get_model_path(args.hf_path))
        quant_predicate = mixed_quant_predicate_builder(
            args.quant_predicate, cfg, group_size=args.q_group_size,
            skip_vision=not args.keep_vision)
    convert(
        args.hf_path, args.tpu_path, args.quantize or bool(quant_predicate),
        args.q_bits, args.q_group_size, args.dtype,
        skip_vision=not args.keep_vision, quant_predicate=quant_predicate,
    )


if __name__ == "__main__":
    main()
