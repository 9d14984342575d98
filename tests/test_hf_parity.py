"""Golden-logits parity vs HF transformers (reference contract:
mlx_vlm/tests/test_models.py per-arch runners — here we go further and
assert numerical fidelity against the upstream implementations).

For each family: build a tiny random HF model, save_pretrained to a tmpdir,
load it back through our full loader pipeline (config.json + safetensors +
sanitize), and compare fp32 logits for (a) a full prefill forward and (b) an
incremental decode step against HF's full-sequence forward at that position.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.loader import load_model

ATOL = 3e-4
RTOL = 2e-3


def _save_hf(hf_model, tmp_path):
    hf_model = hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    return tmp_path


def _ours_logits(model, ids, cap=64, decode_split=None, **aux):
    """Full prefill logits and (optionally) prefill+decode logits."""
    params = model.params
    embeds = jax.jit(model.get_input_embeddings)(
        params, jnp.asarray(ids), **aux
    )
    if hasattr(model, "prepare_position_ids"):
        pos, _ = model.prepare_position_ids(
            np.asarray(ids), aux.get("_grid_thw")
        ) if "_grid_thw" in aux else model.prepare_position_ids(np.asarray(ids))
        pos = jnp.asarray(pos)
    else:
        S = ids.shape[1]
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (3, 1, S))
    cache = model.language_model.init_cache(1, cap, jnp.float32)
    full, _ = jax.jit(model)(params, embeds, cache, pos)
    out = {"full": np.asarray(full)}
    if decode_split is not None:
        t = decode_split
        cache = model.language_model.init_cache(1, cap, jnp.float32)
        _, cache = jax.jit(model)(params, embeds[:, :t], cache, pos[:, :, :t])
        step, _ = jax.jit(model)(
            params, embeds[:, t : t + 1], cache, pos[:, :, t : t + 1]
        )
        out["decode"] = np.asarray(step)[:, 0]
    return out


def _assert_parity(ours, theirs_full, decode_split=None):
    theirs_full = np.asarray(theirs_full, np.float32)
    np.testing.assert_allclose(
        ours["full"], theirs_full, atol=ATOL, rtol=RTOL
    )
    assert (
        ours["full"][:, -1].argmax(-1) == theirs_full[:, -1].argmax(-1)
    ).all(), "greedy token mismatch at prefill"
    if decode_split is not None:
        np.testing.assert_allclose(
            ours["decode"], theirs_full[:, decode_split], atol=ATOL, rtol=RTOL
        )
        assert (
            ours["decode"].argmax(-1) == theirs_full[:, decode_split].argmax(-1)
        ).all(), "greedy token mismatch at decode step"


# --------------------------------------------------------------------------


class TestLlamaParity:
    def test_llama_logits(self, tmp_path):
        import torch
        from transformers import LlamaConfig, LlamaForCausalLM

        torch.manual_seed(0)
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0, tie_word_embeddings=False,
        )
        hf = LlamaForCausalLM(cfg)
        _save_hf(hf, tmp_path)
        ids = np.array([[3, 17, 42, 99, 5, 77, 23, 8]], np.int32)
        with torch.no_grad():
            ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

        model = load_model(tmp_path, dtype=jnp.float32)
        ours = _ours_logits(model, ids, decode_split=5)
        _assert_parity(ours, ref, decode_split=5)


class TestQwen2Parity:
    def test_qwen2_logits(self, tmp_path):
        import torch
        from transformers import Qwen2Config, Qwen2ForCausalLM

        torch.manual_seed(1)
        cfg = Qwen2Config(
            vocab_size=160, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rope_theta=10000.0,
            tie_word_embeddings=False,
        )
        hf = Qwen2ForCausalLM(cfg)
        _save_hf(hf, tmp_path)
        ids = np.array([[1, 7, 100, 52, 9, 33]], np.int32)
        with torch.no_grad():
            ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

        model = load_model(tmp_path, dtype=jnp.float32)
        ours = _ours_logits(model, ids, decode_split=4)
        _assert_parity(ours, ref, decode_split=4)


class TestQwen2VLParity:
    def _tiny(self):
        from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

        cfg = Qwen2VLConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0,
            tie_word_embeddings=False,
            image_token_id=250, video_token_id=251,
            vision_start_token_id=252, vision_end_token_id=253,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            vision_config={
                "depth": 2, "embed_dim": 32, "hidden_size": 64,
                "num_heads": 4, "in_channels": 3, "patch_size": 4,
                "spatial_merge_size": 2, "temporal_patch_size": 2,
                "mlp_ratio": 2, "spatial_patch_size": 4,
            },
        )
        return Qwen2VLForConditionalGeneration(cfg)

    def test_text_only_logits(self, tmp_path):
        import torch

        torch.manual_seed(2)
        hf = self._tiny()
        _save_hf(hf, tmp_path)
        ids = np.array([[3, 17, 42, 99, 5, 77]], np.int32)
        with torch.no_grad():
            ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        model = load_model(tmp_path, dtype=jnp.float32)
        ours = _ours_logits(model, ids, decode_split=4)
        _assert_parity(ours, ref, decode_split=4)

    def test_image_merge_logits(self, tmp_path):
        import torch

        torch.manual_seed(3)
        hf = self._tiny()
        _save_hf(hf, tmp_path)
        # 1 image: grid (1, 4, 4) -> 16 patches -> 4 merged tokens
        grid = np.array([[1, 4, 4]], np.int64)
        n_patch = int(grid.prod())
        pv = np.random.default_rng(0).standard_normal(
            (n_patch, 3 * 2 * 4 * 4)
        ).astype(np.float32)
        img_tok, start, end = 250, 252, 253
        ids = np.array(
            [[5, start] + [img_tok] * 4 + [end, 9, 11]], np.int32
        )
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids, dtype=torch.long),
                pixel_values=torch.tensor(pv),
                image_grid_thw=torch.tensor(grid),
            ).logits.numpy()

        model = load_model(tmp_path, dtype=jnp.float32)
        aux = model.vision_aux_inputs(grid)
        params = model.params
        embeds = jax.jit(model.get_input_embeddings)(
            params, jnp.asarray(ids), jnp.asarray(pv),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        pos, delta = model.prepare_position_ids(ids, grid)
        hf_pos, hf_delta = hf.model.get_rope_index(
            torch.tensor(ids, dtype=torch.long), torch.tensor(grid), None, None
        )
        np.testing.assert_array_equal(np.asarray(pos), hf_pos.numpy())
        np.testing.assert_array_equal(np.asarray(delta), hf_delta.numpy())
        cache = model.language_model.init_cache(1, 32, jnp.float32)
        full, _ = jax.jit(model)(params, embeds, cache, jnp.asarray(pos))
        full = np.asarray(full)
        # conv reduction-order noise through the tower amplifies slightly
        np.testing.assert_allclose(full, ref, atol=1.5e-3, rtol=RTOL)
        assert (full[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).all()


class TestGemma3Parity:
    def test_text_logits(self, tmp_path):
        import torch
        from transformers import Gemma3Config, Gemma3ForConditionalGeneration

        torch.manual_seed(4)
        cfg = Gemma3Config(
            text_config={
                "vocab_size": 300, "hidden_size": 64, "intermediate_size": 128,
                "num_hidden_layers": 4, "num_attention_heads": 4,
                "num_key_value_heads": 2, "head_dim": 16,
                "rope_theta": 10000.0, "sliding_window": 4,
                "sliding_window_pattern": 2, "max_position_embeddings": 256,
            },
            vision_config={
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "image_size": 32, "patch_size": 8, "num_channels": 3,
            },
            mm_tokens_per_image=4, image_token_index=290,
            boi_token_index=291, eoi_token_index=292,
        )
        hf = Gemma3ForConditionalGeneration(cfg)
        _save_hf(hf, tmp_path)
        ids = np.array([[2, 17, 42, 99, 5, 77, 23, 8, 61, 30]], np.int32)
        with torch.no_grad():
            ref = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()
        model = load_model(tmp_path, dtype=jnp.float32)
        ours = _ours_logits(model, ids, decode_split=7)
        _assert_parity(ours, ref, decode_split=7)

    def test_image_logits(self, tmp_path):
        import torch
        from transformers import Gemma3Config, Gemma3ForConditionalGeneration

        torch.manual_seed(5)
        cfg = Gemma3Config(
            text_config={
                "vocab_size": 300, "hidden_size": 64, "intermediate_size": 128,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 2, "head_dim": 16,
                "rope_theta": 10000.0, "sliding_window": 4,
                "sliding_window_pattern": 2, "max_position_embeddings": 256,
            },
            vision_config={
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "image_size": 32, "patch_size": 8, "num_channels": 3,
            },
            mm_tokens_per_image=4, image_token_index=290,
            boi_token_index=291, eoi_token_index=292,
        )
        hf = Gemma3ForConditionalGeneration(cfg)
        _save_hf(hf, tmp_path)
        pv = np.random.default_rng(1).standard_normal((1, 3, 32, 32)).astype(
            np.float32
        )
        ids = np.array([[2, 291] + [290] * 4 + [292, 9, 11]], np.int32)
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids, dtype=torch.long),
                pixel_values=torch.tensor(pv),
            ).logits.numpy()
        model = load_model(tmp_path, dtype=jnp.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv)
        )
        S = ids.shape[1]
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (3, 1, S))
        cache = model.language_model.init_cache(1, 32, jnp.float32)
        full, _ = jax.jit(model)(model.params, embeds, cache, pos)
        full = np.asarray(full)
        np.testing.assert_allclose(full, ref, atol=1.5e-3, rtol=RTOL)
        assert (full[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).all()


class TestPaliGemmaParity:
    def test_image_logits(self, tmp_path):
        import torch
        from transformers import (
            PaliGemmaConfig,
            PaliGemmaForConditionalGeneration,
        )

        torch.manual_seed(6)
        cfg = PaliGemmaConfig(
            text_config={
                "model_type": "gemma", "vocab_size": 300, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 1,
                "head_dim": 16, "rope_theta": 10000.0,
                "max_position_embeddings": 256,
            },
            vision_config={
                "hidden_size": 32, "intermediate_size": 64,
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "image_size": 32, "patch_size": 8, "num_channels": 3,
                "projection_dim": 64,
            },
            image_token_index=290, projection_dim=64,
        )
        hf = PaliGemmaForConditionalGeneration(cfg)
        _save_hf(hf, tmp_path)
        pv = np.random.default_rng(2).standard_normal((1, 3, 32, 32)).astype(
            np.float32
        )
        n_img = (32 // 8) ** 2
        ids = np.array([[290] * n_img + [2, 9, 11, 40]], np.int32)
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids, dtype=torch.long),
                pixel_values=torch.tensor(pv),
            ).logits.numpy()
        model = load_model(tmp_path, dtype=jnp.float32)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv)
        )
        S = ids.shape[1]
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (3, 1, S))
        cache = model.language_model.init_cache(1, 32, jnp.float32)
        full, _ = jax.jit(model)(model.params, embeds, cache, pos)
        full = np.asarray(full)
        np.testing.assert_allclose(full, ref, atol=1.5e-3, rtol=RTOL)
        assert (full[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).all()


class TestQwen25VLParity:
    def test_image_logits(self, tmp_path):
        import torch
        from transformers import (
            Qwen2_5_VLConfig,
            Qwen2_5_VLForConditionalGeneration,
        )

        torch.manual_seed(7)
        cfg = Qwen2_5_VLConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, rope_theta=10000.0,
            tie_word_embeddings=False,
            image_token_id=250, video_token_id=251,
            vision_start_token_id=252, vision_end_token_id=253,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            vision_config={
                "depth": 2, "hidden_size": 32, "out_hidden_size": 64,
                "num_heads": 4, "in_channels": 3, "patch_size": 4,
                "spatial_merge_size": 2, "temporal_patch_size": 2,
                "intermediate_size": 64, "window_size": 8,
                "fullatt_block_indexes": [1],
            },
        )
        hf = Qwen2_5_VLForConditionalGeneration(cfg)
        _save_hf(hf, tmp_path)
        grid = np.array([[1, 4, 4]], np.int64)
        pv = np.random.default_rng(3).standard_normal(
            (16, 3 * 2 * 4 * 4)
        ).astype(np.float32)
        ids = np.array([[5, 252] + [250] * 4 + [253, 9, 11]], np.int32)
        with torch.no_grad():
            ref = hf(
                torch.tensor(ids, dtype=torch.long),
                pixel_values=torch.tensor(pv),
                image_grid_thw=torch.tensor(grid),
            ).logits.numpy()
        model = load_model(tmp_path, dtype=jnp.float32)
        aux = model.vision_aux_inputs(grid)
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv),
            **{k: jnp.asarray(v) for k, v in aux.items()},
        )
        pos, _ = model.prepare_position_ids(ids, grid)
        cache = model.language_model.init_cache(1, 32, jnp.float32)
        full, _ = jax.jit(model)(model.params, embeds, cache, jnp.asarray(pos))
        full = np.asarray(full)
        np.testing.assert_allclose(full, ref, atol=1.5e-3, rtol=RTOL)
        assert (full[:, -1].argmax(-1) == ref[:, -1].argmax(-1)).all()
