import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.diffusion import (
    diffusion_generate,
    is_diffusion_model,
    stream_diffusion_generate,
)
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import llama_hf_weights, tiny_llama_config


@pytest.fixture(scope="module")
def model():
    cfg = tiny_llama_config(model_type="llada", vocab_size=256)
    cfg["mask_token_id"] = 255
    cfg["diffusion"] = True
    return load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)


class _Tok:
    eos_token_id = 254

    def decode(self, ids, **kw):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def __call__(self, text, **kw):
        ids = [(ord(c) * 3) % 250 for c in str(text)][:16]
        return {"input_ids": np.asarray([ids]),
                "attention_mask": np.ones((1, len(ids)), np.int64)}


class _Proc:
    tokenizer = _Tok()

    def __call__(self, text=None, **kw):
        return self.tokenizer(text[0] if isinstance(text, list) else text)


class TestDiffusion:
    def test_detection(self, model):
        assert is_diffusion_model(model)

    def test_fills_all_positions(self, model):
        results = list(
            stream_diffusion_generate(
                model, _Proc(), "hello there", max_tokens=12, block_size=4
            )
        )
        toks = [r.token for r in results]
        assert len(toks) == 12
        assert all(t != 255 for t in toks), "mask tokens must all be replaced"
        assert results[-1].finish_reason == "length"

    def test_deterministic(self, model):
        t1 = [r.token for r in stream_diffusion_generate(
            model, _Proc(), "abc", max_tokens=8, block_size=4)]
        t2 = [r.token for r in stream_diffusion_generate(
            model, _Proc(), "abc", max_tokens=8, block_size=4)]
        assert t1 == t2

    def test_blocking_api(self, model):
        res = diffusion_generate(model, _Proc(), "xyz", max_tokens=6,
                                 block_size=3)
        assert res.generation_tokens == 6


class TestEntropyBoundSampler:
    def test_entropy_transfer_mask_prefix(self):
        """Low-entropy open positions commit together; the high-entropy
        tail waits (reference diffusion.py:415)."""
        import jax.numpy as jnp
        from mlx_vlm_tpu.generate.diffusion import entropy_transfer_mask

        ent = jnp.asarray([[0.01, 0.02, 2.0, 0.015, 3.0]])
        open_mask = jnp.asarray([[True, True, True, True, True]])
        take = np.asarray(entropy_transfer_mask(ent, open_mask, 0.1))[0]
        # reference criterion: cum - cummax <= bound over the sorted
        # prefix — the sum of all non-max selected entropies stays under
        # the bound.  [0.01, 0.015, 0.02] sum to 0.045 so 2.0 still
        # enters (0.045 <= 0.1); adding 2.0 pushes the residual for 3.0
        # to 2.045 > 0.1, which stops the prefix there.
        assert take[0] and take[1] and take[2] and take[3]
        assert not take[4]

    def test_always_commits_one(self):
        import jax.numpy as jnp
        from mlx_vlm_tpu.generate.diffusion import entropy_transfer_mask

        ent = jnp.asarray([[5.0, 6.0, 7.0]])
        open_mask = jnp.asarray([[True, True, True]])
        take = np.asarray(entropy_transfer_mask(ent, open_mask, 0.01))[0]
        assert take.sum() == 1 and take[0]

    def test_respects_open_mask(self):
        import jax.numpy as jnp
        from mlx_vlm_tpu.generate.diffusion import entropy_transfer_mask

        ent = jnp.asarray([[0.001, 0.001, 0.001]])
        open_mask = jnp.asarray([[False, True, False]])
        take = np.asarray(entropy_transfer_mask(ent, open_mask, 1.0))[0]
        assert take.tolist() == [False, True, False]

    def test_entropy_sampler_generates(self):
        """llada end-to-end with diffusion_sampler='entropy-bound'."""
        cfg = tiny_llama_config(model_type="llada", vocab_size=256)
        cfg["mask_token_id"] = 255
        cfg["diffusion"] = True
        model = load_model_from_weights(cfg, llama_hf_weights(cfg, 0),
                                        jnp.float32)
        out = list(stream_diffusion_generate(
            model, _Proc(), "hello", max_tokens=8, block_size=4,
            diffusion_sampler="entropy-bound", entropy_bound=0.5))
        assert len(out) == 8
        assert out[-1].finish_reason == "length"


class TestPostFillEditing:
    def test_editing_runs_and_threshold_gates(self):
        """editing_threshold re-opens committed tokens the model
        contradicts with high confidence; threshold=inf edits nothing."""
        from mlx_vlm_tpu.generate.diffusion import stream_diffusion_generate
        from mlx_vlm_tpu.utils.loader import load_model_from_weights
        from mlx_vlm_tpu.utils.testing import (llama_hf_weights,
                                               tiny_llama_config)

        cfg = tiny_llama_config(model_type="llada", vocab_size=256)
        cfg["mask_token_id"] = 255
        cfg["diffusion"] = True
        m = load_model_from_weights(cfg, llama_hf_weights(cfg, 0),
                                    jnp.float32)
        base = [r.token for r in stream_diffusion_generate(
            m, _Proc(), "hello", max_tokens=8, block_size=4)]
        inf_edit = [r.token for r in stream_diffusion_generate(
            m, _Proc(), "hello", max_tokens=8, block_size=4,
            editing_threshold=1.1)]  # > any softmax prob: no edits
        assert inf_edit == base
        # a permissive threshold runs the editing pass without crashing
        edited = [r.token for r in stream_diffusion_generate(
            m, _Proc(), "hello", max_tokens=8, block_size=4,
            editing_threshold=0.0, max_post_steps=2)]
        assert len(edited) == 8
