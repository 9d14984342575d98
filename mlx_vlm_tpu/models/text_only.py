"""Text-only fallback: wraps plain language models so any LLM checkpoint
works through the VLM APIs.

Role parity: reference mlx_vlm/models/text_only.py:13 (delegates to
mlx_lm's classes; selected by `_is_text_only_config`, utils.py:418).  Here we
dispatch model_type to our own decoder families.
"""

from __future__ import annotations

from .llama import LanguageModel as _LlamaLM  # noqa: F401
from .llama import Model as _LlamaModel
from .llama.config import TextConfig as _LlamaConfig

# model_type -> (Model, ModelConfig). Llama-architecture covers llama,
# mistral, qwen2 (qkv-bias weights picked up from the checkpoint directly)
# and qwen3 (per-head q/k norms picked up the same way).
_TEXT_ARCHS = {
    "llama": (_LlamaModel, _LlamaConfig),
    "mistral": (_LlamaModel, _LlamaConfig),
    "qwen2": (_LlamaModel, _LlamaConfig),
    "qwen3": (_LlamaModel, _LlamaConfig),
}


def is_text_only_config(config: dict) -> bool:
    """Reference utils.py:418 `_is_text_only_config`."""
    return (
        "vision_config" not in config
        and "audio_config" not in config
        and config.get("model_type") in _TEXT_ARCHS
    )


class ModelConfig:
    @classmethod
    def from_dict(cls, params: dict):
        mt = params.get("model_type")
        if mt not in _TEXT_ARCHS:
            raise ValueError(f"text_only: unsupported model type {mt}")
        _, cfg_cls = _TEXT_ARCHS[mt]
        return cfg_cls.from_dict(params)


def Model(config):
    model_cls, _ = _TEXT_ARCHS[config.model_type]
    return model_cls(config)
