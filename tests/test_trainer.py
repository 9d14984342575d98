import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mlx_vlm_tpu.trainer.lora import (
    apply_lora_layers,
    attach_lora,
    fuse_lora,
    init_lora,
    load_adapter,
    make_lora_train_step,
    save_adapter,
)
from mlx_vlm_tpu.trainer.sft import make_train_step, sft_loss
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import (
    llama_hf_weights,
    make_tiny_qwen2_vl,
    tiny_llama_config,
)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_llama_config()
    return load_model_from_weights(cfg, llama_hf_weights(cfg, 0), jnp.float32)


def _batch(B=2, S=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 200, (B, S)).astype(np.int32)
    labels = ids.astype(np.int32).copy()
    labels[:, : S // 3] = -100
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S)).copy()
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
    }


class TestSFT:
    def test_loss_finite_and_decreases(self, model):
        tx = optax.adam(1e-2)
        step = jax.jit(make_train_step(model, tx))
        params = model.params
        opt_state = tx.init(params)
        batch = _batch()
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestLoRA:
    def test_init_and_noop(self, model):
        lora = init_lora(model.params, rank=4)
        assert any("q_proj" in k for k in lora)
        merged = attach_lora(model.params, lora)
        # b starts at zero -> adapter is exactly a no-op
        batch = _batch()
        l0 = sft_loss(model, model.params, batch["input_ids"], batch["labels"], batch["position_ids"])
        l1 = sft_loss(model, merged, batch["input_ids"], batch["labels"], batch["position_ids"])
        assert float(l0) == pytest.approx(float(l1), abs=1e-6)

    def test_training_only_updates_lora(self, model):
        lora = init_lora(model.params, rank=4)
        tx = optax.adam(5e-2)
        step = jax.jit(make_lora_train_step(model, tx))
        opt_state = tx.init(lora)
        batch = _batch(seed=3)
        base_before = jax.tree_util.tree_map(lambda x: np.asarray(x), model.params)
        losses = []
        for _ in range(6):
            lora, opt_state, loss = step(lora, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        # base params untouched
        after = jax.tree_util.tree_map(lambda x: np.asarray(x), model.params)
        for a, b in zip(jax.tree_util.tree_leaves(base_before), jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)

    def test_fuse_matches_attach(self, model):
        lora = init_lora(model.params, rank=4, seed=2)
        # give lora_b nonzero values
        lora = jax.tree_util.tree_map(
            lambda x: x + 0.01 * np.random.default_rng(0).standard_normal(x.shape).astype(np.float32),
            lora,
        )
        batch = _batch(seed=5)
        l_attach = sft_loss(model, attach_lora(model.params, lora), batch["input_ids"], batch["labels"], batch["position_ids"])
        l_fused = sft_loss(model, fuse_lora(model.params, lora), batch["input_ids"], batch["labels"], batch["position_ids"])
        assert float(l_attach) == pytest.approx(float(l_fused), rel=1e-4)

    def test_save_load_roundtrip(self, model):
        lora = init_lora(model.params, rank=4, seed=4)
        with tempfile.TemporaryDirectory() as d:
            save_adapter(d, lora, {"rank": 4})
            loaded = load_adapter(d)
        for path in lora:
            np.testing.assert_allclose(
                np.asarray(lora[path]["lora_a"]), np.asarray(loaded[path]["lora_a"])
            )

    def test_lora_on_vlm(self):
        vlm = make_tiny_qwen2_vl(seed=2, dtype=jnp.float32)
        lora = init_lora(vlm.params, rank=2)
        assert any("language_model" in k for k in lora)


class TestORPO:
    def test_preference_training_improves_margin(self, model):
        from mlx_vlm_tpu.trainer.orpo import make_orpo_train_step, orpo_loss

        rng = np.random.default_rng(0)
        B, S = 2, 10

        def mk(seed):
            ids = np.random.default_rng(seed).integers(0, 200, (B, S)).astype(np.int32)
            labels = ids.astype(np.int64).copy()
            labels[:, :3] = -100
            pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S)).copy()
            return ids, labels, pos

        c_ids, c_lab, c_pos = mk(1)
        r_ids, r_lab, r_pos = mk(2)
        batch = {
            "chosen_input_ids": jnp.asarray(c_ids),
            "chosen_labels": jnp.asarray(c_lab),
            "chosen_position_ids": jnp.asarray(c_pos),
            "rejected_input_ids": jnp.asarray(r_ids),
            "rejected_labels": jnp.asarray(r_lab),
            "rejected_position_ids": jnp.asarray(r_pos),
        }
        tx = optax.adam(5e-3)
        step = jax.jit(make_orpo_train_step(model, tx))
        params = model.params
        opt_state = tx.init(params)
        margins = []
        for _ in range(6):
            params, opt_state, loss, metrics = step(params, opt_state, batch)
            margins.append(float(metrics["margin"]))
            assert np.isfinite(float(loss))
        assert margins[-1] > margins[0], margins
