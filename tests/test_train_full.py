"""DoRA, gradient checkpointing, full-finetune loop + checkpoint save.

Contract parity: reference trainer/dora_layers.py (DoRALinear — no-op at
init, fuse matches runtime), trainer/trainer.py grad_checkpoint, and
sft_trainer.py:362 (train loop with eval + save).
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mlx_vlm_tpu.trainer.lora import (attach_lora, fuse_dora, init_dora,
                                      make_lora_train_step, save_adapter,
                                      load_adapter)
from mlx_vlm_tpu.trainer.sft import make_train_step, sft_loss
from mlx_vlm_tpu.utils.loader import load_model_from_weights
from mlx_vlm_tpu.utils.testing import (llama_hf_weights, make_tiny_qwen2_vl,
                                       tiny_llama_config)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_llama_config()
    return load_model_from_weights(cfg, llama_hf_weights(cfg, 0),
                                   jnp.float32)


def _batch(B=2, S=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 200, (B, S)).astype(np.int32)
    labels = ids.astype(np.int32).copy()
    labels[:, : S // 3] = -100
    pos = np.broadcast_to(np.arange(S, dtype=np.int32), (3, B, S)).copy()
    return {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
            "position_ids": jnp.asarray(pos)}


class TestDoRA:
    def test_init_is_noop(self, model):
        """m initialised to the base row norms -> identical logits."""
        dora = init_dora(model.params, rank=4)
        assert all("dora_m" in fac for fac in dora.values())
        batch = _batch()
        base = sft_loss(model, model.params, batch["input_ids"],
                        batch["labels"], batch["position_ids"])
        merged = attach_lora(model.params, dora)
        with_d = sft_loss(model, merged, batch["input_ids"],
                          batch["labels"], batch["position_ids"])
        np.testing.assert_allclose(float(base), float(with_d), rtol=1e-5)

    def test_training_decreases_loss(self, model):
        dora = init_dora(model.params, rank=4)
        tx = optax.adam(1e-2)
        step = jax.jit(make_lora_train_step(model, tx))
        opt_state = tx.init(dora)
        batch = _batch()
        losses = []
        for _ in range(5):
            dora, opt_state, loss = step(dora, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_m_actually_trains(self, model):
        dora = init_dora(model.params, rank=4)
        m0 = {p: np.asarray(f["dora_m"]) for p, f in dora.items()}
        tx = optax.adam(1e-2)
        step = jax.jit(make_lora_train_step(model, tx))
        opt_state = tx.init(dora)
        for _ in range(3):
            dora, opt_state, _ = step(dora, opt_state, _batch())
        moved = any(not np.allclose(m0[p], np.asarray(f["dora_m"]))
                    for p, f in dora.items())
        assert moved

    def test_fuse_matches_attach(self, model):
        dora = init_dora(model.params, rank=4, seed=2)
        # perturb so the adapter is non-trivial
        dora = jax.tree.map(lambda x: x + 0.01, dora)
        batch = _batch()
        attached = attach_lora(model.params, dora)
        la = sft_loss(model, attached, batch["input_ids"], batch["labels"],
                      batch["position_ids"])
        fused = fuse_dora(model.params, dora)
        lf = sft_loss(model, fused, batch["input_ids"], batch["labels"],
                      batch["position_ids"])
        np.testing.assert_allclose(float(la), float(lf), rtol=1e-4)

    def test_save_load_roundtrip(self, model, tmp_path):
        dora = init_dora(model.params, rank=4)
        save_adapter(str(tmp_path), dora, {"mode": "dora"})
        loaded = load_adapter(str(tmp_path))
        for p, fac in dora.items():
            assert set(loaded[p]) == {"lora_a", "lora_b", "dora_m"}, p


class TestGradCheckpoint:
    def test_same_loss_and_grads(self, model):
        """Remat changes memory, never values."""
        batch = _batch()
        tx = optax.adam(1e-2)

        model.language_model.remat = False
        step_plain = jax.jit(make_train_step(model, tx))
        p1, _, l1 = step_plain(model.params, tx.init(model.params), batch)

        step_ckpt = jax.jit(make_train_step(model, tx,
                                            grad_checkpoint=True))
        p2, _, l2 = step_ckpt(model.params, tx.init(model.params), batch)
        model.language_model.remat = False
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        a = p1["language_model"]["model"]["layers"]["self_attn"]["q_proj"]
        b = p2["language_model"]["model"]["layers"]["self_attn"]["q_proj"]
        np.testing.assert_allclose(np.asarray(a["weight"]),
                                   np.asarray(b["weight"]), rtol=1e-5)


class TestFullFinetune:
    def test_unstack_roundtrip_logits(self, tmp_path):
        """save_full_model -> load() must reproduce the model exactly."""
        from mlx_vlm_tpu.trainer.train import save_full_model
        from mlx_vlm_tpu.utils.loader import load

        model = make_tiny_qwen2_vl(seed=3, dtype=jnp.float32)
        save_full_model(str(tmp_path / "ckpt"), model)
        # tokenizer-free load path: load_model
        from mlx_vlm_tpu.utils.loader import load_model

        again = load_model(str(tmp_path / "ckpt"), dtype=jnp.float32)
        ids = (np.arange(8, dtype=np.int32) * 7 % 150)[None]
        pos = np.broadcast_to(np.arange(8, dtype=np.int32), (3, 1, 8)).copy()

        def logits(m):
            emb = m.get_input_embeddings(m.params, jnp.asarray(ids))
            h, _ = m.language_model(m.params["language_model"], emb, None,
                                    jnp.asarray(pos))
            return np.asarray(m.language_model.logits(
                m.params["language_model"], h))

        np.testing.assert_allclose(logits(model), logits(again),
                                   rtol=1e-5, atol=1e-5)

    def test_train_loop_full_mode(self, model, tmp_path, monkeypatch):
        """train() in full mode runs, reports, evals, and saves."""
        from mlx_vlm_tpu.trainer.train import TrainConfig, train

        class FakeDS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                b = _batch(B=1, S=10, seed=i)
                return {k: np.asarray(v)[0] if k != "position_ids"
                        else np.asarray(v)[:, 0] for k, v in b.items()}

        # iterate_batches consumes VisionDataset-shaped items; emulate by
        # monkeypatching it with a simple batcher
        import mlx_vlm_tpu.trainer.train as train_mod

        def fake_iterate(ds, bs, msl, seed=0):
            yield _batch(B=bs, S=10, seed=seed)

        import mlx_vlm_tpu.trainer.datasets as ds_mod

        monkeypatch.setattr(ds_mod, "iterate_batches", fake_iterate)
        logs = []
        cfg = TrainConfig(mode="full", iters=4, batch_size=2,
                          steps_per_report=2, steps_per_eval=2,
                          eval_batches=1,
                          out_path=str(tmp_path / "full"))
        trained = train(model, None, FakeDS(), cfg, val_dataset=FakeDS(),
                        log=logs.append)
        assert any("train loss" in ln for ln in logs)
        assert any("val loss" in ln for ln in logs)
        assert (tmp_path / "full" / "config.json").exists()
        assert list((tmp_path / "full").glob("*.safetensors"))
