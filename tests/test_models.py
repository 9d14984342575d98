"""Per-architecture contract tests.

Parity with reference mlx_vlm/tests/test_models.py: every architecture is
instantiated from a tiny config with random weights and run through shared
runners checking logits shape/dtype for a short prompt + one decode step, in
fp32 and bf16 (language_test_runner test_models.py:14), plus cache-consistency.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step, make_cache
from mlx_vlm_tpu.utils import testing as T
from mlx_vlm_tpu.utils.loader import load_model_from_weights


def _builders():
    from tests.test_idefics3 import tiny_idefics3_config, tiny_idefics3_weights
    from tests.test_pixtral import tiny_pixtral_config, tiny_pixtral_weights
    from tests.test_qwen3_vl import make_tiny_qwen3_vl
    from tests.test_aya_vision import tiny_aya_config, tiny_aya_weights
    from tests.test_llama4 import make_tiny_llama4
    from tests.test_mistral3 import tiny_mistral3_config, tiny_mistral3_weights

    def _aya(dt):
        return load_model_from_weights(
            tiny_aya_config(), tiny_aya_weights(tiny_aya_config()), dt
        )

    from tests.test_glm4v import tiny_glm4v_config, tiny_glm4v_weights

    def _glm(dt):
        return load_model_from_weights(
            tiny_glm4v_config(), tiny_glm4v_weights(tiny_glm4v_config()), dt
        )

    from tests.test_deepseek_vl2 import tiny_dsvl2_config, tiny_dsvl2_weights
    from tests.test_kimi_vl import tiny_kimi_config, tiny_kimi_weights
    from tests.test_molmo import tiny_molmo_config, tiny_molmo_weights
    from tests.test_phi3_v import tiny_phi3v_config, tiny_phi3v_weights

    def _phi(dt):
        return load_model_from_weights(
            tiny_phi3v_config(), tiny_phi3v_weights(tiny_phi3v_config()), dt
        )

    def _kimi(dt):
        return load_model_from_weights(
            tiny_kimi_config(), tiny_kimi_weights(tiny_kimi_config()), dt
        )

    def _dsvl(dt):
        return load_model_from_weights(
            tiny_dsvl2_config(), tiny_dsvl2_weights(tiny_dsvl2_config()), dt
        )

    def _molmo(dt):
        return load_model_from_weights(
            tiny_molmo_config(), tiny_molmo_weights(tiny_molmo_config()), dt
        )

    from tests.test_gemma3n import tiny_g3n_config, tiny_g3n_weights

    def _g3n(dt):
        return load_model_from_weights(
            tiny_g3n_config(), tiny_g3n_weights(tiny_g3n_config()), dt
        )
    from tests.test_internvl import tiny_internvl_config, tiny_internvl_weights

    return {
        "qwen3_vl": lambda dt: make_tiny_qwen3_vl(0, dt),
        "llama4": lambda dt: make_tiny_llama4(0, dt),
        "aya_vision": lambda dt: _aya(dt),
        "glm4v": lambda dt: _glm(dt),
        "phi3_v": lambda dt: _phi(dt),
        "kimi_vl": lambda dt: _kimi(dt),
        "deepseek_vl_v2": lambda dt: _dsvl(dt),
        "molmo": lambda dt: _molmo(dt),
        "gemma3n_text": lambda dt: _g3n(dt),
        "mistral3": lambda dt: load_model_from_weights(
            tiny_mistral3_config(), tiny_mistral3_weights(tiny_mistral3_config()), dt
        ),
        "internvl_chat": lambda dt: load_model_from_weights(
            tiny_internvl_config(), tiny_internvl_weights(tiny_internvl_config()), dt
        ),
        "qwen2_vl": lambda dt: T.make_tiny_qwen2_vl(0, dt),
        "qwen2_5_vl": lambda dt: T.make_tiny_qwen2_5_vl(0, dt),
        "gemma3": lambda dt: T.make_tiny_gemma3(0, dt),
        "paligemma": lambda dt: T.make_tiny_paligemma(0, dt),
        "paligemma2": lambda dt: T.make_tiny_paligemma(0, dt, gemma2=True),
        "llava": lambda dt: T.make_tiny_llava(0, dt),
        "llama": lambda dt: load_model_from_weights(
            T.tiny_llama_config(), T.llama_hf_weights(T.tiny_llama_config(), 0), dt
        ),
        "qwen2_moe": lambda dt: load_model_from_weights(
            T.tiny_qwen2_moe_config(),
            T.qwen2_moe_hf_weights(T.tiny_qwen2_moe_config(), 0), dt,
        ),
        "idefics3": lambda dt: load_model_from_weights(
            tiny_idefics3_config(), tiny_idefics3_weights(tiny_idefics3_config()), dt
        ),
        "pixtral": lambda dt: load_model_from_weights(
            tiny_pixtral_config(), tiny_pixtral_weights(tiny_pixtral_config()), dt
        ),
    }


ARCHS = list(_builders().keys())


def language_test_runner(model, dtype):
    """Logits contract: [B,S,V] for prompt, [B,1,V] for a decode step."""
    tc = getattr(model.config, "text_config", model.config)
    V = tc.vocab_size
    B, S = 1, 6
    ids = (np.arange(S, dtype=np.int32) % 200)[None]
    embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    assert embeds.dtype == dtype
    cache = make_cache(model, B, 16, dtype)
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S))
    logits, cache = model(model.params, embeds, cache, jnp.asarray(pos))
    assert logits.shape == (B, S, V)
    e2 = jax.jit(model.get_input_embeddings)(
        model.params, jnp.asarray(np.asarray([[3]], np.int32))
    )
    pos2 = np.full((3, B, 1), S, np.int32)
    logits2, cache = model(model.params, e2, cache, jnp.asarray(pos2))
    assert logits2.shape == (B, 1, V)
    assert np.isfinite(np.asarray(logits2, np.float32)).all()


@pytest.mark.parametrize("arch", ARCHS)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_language_contract(arch, dtype):
    model = _builders()[arch](dtype)
    language_test_runner(model, dtype)


@pytest.mark.parametrize("arch", ARCHS)
def test_greedy_generate_contract(arch):
    model = _builders()[arch](jnp.float32)
    ids = (np.arange(8, dtype=np.int32) % 200)[None]
    embeds = jax.jit(model.get_input_embeddings)(model.params, jnp.asarray(ids))
    toks = [int(t[0]) for t, _ in generate_step(embeds, model, max_tokens=3)]
    assert len(toks) == 3
