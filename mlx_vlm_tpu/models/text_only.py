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

class _GemmaTextModel:
    """gemma / gemma2 text checkpoints through the paligemma decoder."""

    def __init__(self, config):
        from .paligemma.language import LanguageModel as _GemmaLM

        self.config = config
        self.language_model = _GemmaLM(config)

    def get_input_embeddings(self, params, input_ids, pixel_values=None, **aux):
        return self.language_model.embed(params["language_model"], input_ids)

    def __call__(self, params, inputs_embeds, cache, position_ids):
        lm = params["language_model"]
        hidden, cache = self.language_model(lm, inputs_embeds, cache,
                                            position_ids)
        return self.language_model.logits(lm, hidden), cache

    def prepare_position_ids(self, input_ids, image_grid_thw=None,
                             video_grid_thw=None, attention_mask=None):
        from .llama.llama import text_position_ids

        return text_position_ids(input_ids, attention_mask)

    def vision_aux_inputs(self, grid_thw):
        return {}

    @staticmethod
    def sanitize(weights):
        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            if not k.startswith("language_model."):
                k = "language_model." + k
            out[k] = v
        return out

    @property
    def stack_patterns(self):
        return ("language_model.model.layers",)


def _gemma_text_config(params: dict):
    from .paligemma.config import TextConfig as _GemmaConfig

    p = dict(params)
    # text-only gemma is causal (bidirectional is a paligemma-prefix thing)
    p.setdefault("use_bidirectional_attention", False)
    return _GemmaConfig.from_dict(p)


class _GemmaConfigFactory:
    @staticmethod
    def from_dict(params: dict):
        return _gemma_text_config(params)


# model_type -> (Model, ModelConfig). Llama-architecture covers llama,
# mistral, qwen2 (qkv-bias weights picked up from the checkpoint directly)
# and qwen3 (per-head q/k norms picked up the same way); gemma/gemma2 run
# on the paligemma decoder ((1+w) norms, sqrt(D) embed scale, softcapping).
_TEXT_ARCHS = {
    "llama": (_LlamaModel, _LlamaConfig),
    "mistral": (_LlamaModel, _LlamaConfig),
    "qwen2": (_LlamaModel, _LlamaConfig),
    "qwen3": (_LlamaModel, _LlamaConfig),
    "gemma": (_GemmaTextModel, _GemmaConfigFactory),
    "gemma2": (_GemmaTextModel, _GemmaConfigFactory),
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
