"""Drafter registry + checkpoint loading for speculative decoding.

Role parity: reference mlx_vlm/speculative/drafters/__init__.py —
`DRAFTER_KIND_BY_MODEL_TYPE`:11, `load_drafter`, target-compatibility
validation:37.  A drafter checkpoint is a directory with config.json
(model_type selecting the kind) + safetensors; eagle3/mtp drafters share
the target's embed/lm_head when the checkpoint omits them.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from .dflash import DFlashConfig, DFlashDrafter
from .eagle3 import Eagle3Config, Eagle3Drafter
from .mtp import MTPConfig, MTPDrafter

DRAFTER_KIND_BY_MODEL_TYPE = {
    "deepseek_v4_mtp": "mtp",
    "eagle3": "eagle3",
    "gemma4_assistant": "mtp",
    "gemma4_unified_assistant": "mtp",
    "glm4_moe_lite_mtp": "mtp",
    "inkling_mtp": "mtp",
    "qwen3_5_mtp": "mtp",
    "qwen3_dflash": "dflash",
    "qwen3_5_dflash": "dflash",
}

logger = logging.getLogger(__name__)


def resolve_drafter_kind(model_type: str) -> str:
    """model_type -> drafter kind; plain LMs draft as-is ("vanilla")."""
    kind = DRAFTER_KIND_BY_MODEL_TYPE.get(model_type)
    if kind is not None:
        return kind
    low = str(model_type).lower()
    if "dflash" in low:
        return "dflash"
    if "mtp" in low:
        return "mtp"
    return "vanilla"

_CFG_FIELDS = (
    "hidden_size", "intermediate_size", "num_attention_heads",
    "num_key_value_heads", "vocab_size", "rms_norm_eps", "rope_theta",
)


def validate_drafter_compatibility(target_model, config: dict, kind: str):
    """Reference drafters/__init__.py:37 — config-field (not repo-name)
    compatibility: the drafter's hidden size must match the target's."""
    tgt_cfg = getattr(target_model, "config", None)
    tc = getattr(tgt_cfg, "text_config", tgt_cfg)
    target_hidden = getattr(tc, "hidden_size", None)
    draft_hidden = (
        config.get("backbone_hidden_size")
        or config.get("target_hidden_size")
        or config.get("hidden_size")
    )
    if (target_hidden is not None and draft_hidden is not None
            and target_hidden != draft_hidden):
        raise ValueError(
            f"drafter hidden_size={draft_hidden} does not match the target's "
            f"hidden_size={target_hidden}"
        )
    vocab = config.get("vocab_size")
    tgt_vocab = getattr(tc, "vocab_size", None)
    if kind == "mtp" and vocab and tgt_vocab and vocab != tgt_vocab:
        raise ValueError(
            f"MTP drafter vocab {vocab} != target vocab {tgt_vocab}"
        )


def _nest(flat: dict) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return out


def load_drafter(
    path, target_model, dtype=jnp.float32, kind: Optional[str] = None
) -> Tuple[Any, dict, str]:
    """Load (drafter, params, kind) from a checkpoint directory.

    Missing embed_tokens / lm_head are shared from the target (reference
    bind(), drafters/deepseek_v4_mtp:95)."""
    path = Path(path)
    config = json.loads((path / "config.json").read_text())
    model_type = config.get("model_type", "")
    if kind is None:
        kind = DRAFTER_KIND_BY_MODEL_TYPE.get(model_type)
        if kind is None and "dflash" in model_type.lower():
            kind = "dflash"
        if kind is None and "mtp" in model_type.lower():
            kind = "mtp"
        if kind is None:
            raise ValueError(f"unknown drafter model_type {model_type!r}")
    validate_drafter_compatibility(target_model, config, kind)

    fields = {k: config[k] for k in _CFG_FIELDS if k in config}
    if kind == "eagle3":
        cap = tuple(config.get("capture_layers", (1, 2, 3)))
        drafter = Eagle3Drafter(Eagle3Config(capture_layers=cap, **fields))
    elif kind == "mtp":
        drafter = MTPDrafter(MTPConfig(**fields))
    elif kind == "dflash":
        dcfg = config.get("dflash_config", {}) or {}
        drafter = DFlashDrafter(DFlashConfig(
            **fields,
            num_hidden_layers=config.get("num_hidden_layers", 5),
            head_dim=config.get("head_dim"),
            mask_token_id=int(dcfg.get("mask_token_id",
                                       config.get("mask_token_id", 0))),
            block_size=int(dcfg.get("runtime_block_size")
                           or config.get("block_size", 16)),
            target_layer_ids=tuple(dcfg.get(
                "target_layer_ids",
                config.get("target_layer_ids", (1, 8, 15, 22, 29)))),
            target_hidden_size=config.get("target_hidden_size"),
        ))
    else:
        raise ValueError(f"unsupported drafter kind {kind!r}")

    from safetensors import safe_open

    flat: dict = {}
    for f in sorted(path.glob("*.safetensors")):
        with safe_open(str(f), framework="numpy") as sf:
            for k in sf.keys():
                flat[k.replace("model.", "", 1) if k.startswith("model.")
                     else k] = sf.get_tensor(k)
    params = _nest(flat)
    if kind == "dflash" and isinstance(params.get("layers"), dict):
        # stack layers.0..layers.N-1 along a leading axis for lax.scan
        import jax

        idx = sorted(params["layers"], key=int)
        params["layers"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[params["layers"][i] for i in idx])
    if kind == "dflash":
        # dflash borrows the target's embed/lm_head at draft time
        return drafter, params, kind
    # share target embeddings / head when absent in the drafter checkpoint
    tgt = target_model.params.get("language_model", target_model.params)
    if "embed_tokens" not in params:
        params["embed_tokens"] = tgt["model"]["embed_tokens"]
    if "lm_head" not in params:
        params["lm_head"] = tgt.get(
            "lm_head", tgt["model"]["embed_tokens"]
        )
    return drafter, params, kind


__all__ = [
    "DRAFTER_KIND_BY_MODEL_TYPE", "load_drafter",
    "validate_drafter_compatibility", "Eagle3Drafter", "Eagle3Config",
    "MTPDrafter", "MTPConfig", "DFlashDrafter", "DFlashConfig",
]
