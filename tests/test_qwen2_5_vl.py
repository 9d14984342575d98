import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.generate.ar import generate_step
from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_5_vl


@pytest.fixture(scope="module")
def model():
    return make_tiny_qwen2_5_vl(seed=0, dtype=jnp.float32)


def _aux_dev(aux):
    return {k: jnp.asarray(v) for k, v in aux.items()}


class TestVision:
    def test_window_aux_shapes(self, model):
        grid = np.asarray([[1, 8, 8]])  # 64 patches, 16 merged, vit_ws=2
        aux = model.vision_aux_inputs(grid)
        assert aux["rotary_freqs"].shape[0] == 64
        assert aux["seg_full"].shape == (64,)
        assert aux["seg_win"].shape == (64,)
        assert sorted(aux["window_index"].tolist()) == list(range(16))
        # reverse must invert the window permutation
        wi = aux["window_index"]
        assert (wi[aux["reverse_index"]][np.argsort(np.arange(16))] >= 0).all()
        np.testing.assert_array_equal(np.sort(aux["patch_perm"]), np.arange(64))
        # windows of 2x2 merged tokens = 16 patches each
        counts = np.bincount(aux["seg_win"])
        assert (counts == 16).all()

    def test_tower_output_order(self, model):
        """Merged features must come back in original (pre-window) order."""
        vc = model.config.vision_config
        grid = np.asarray([[1, 8, 8]])
        aux = model.vision_aux_inputs(grid)
        D = vc.in_channels * vc.temporal_patch_size * vc.patch_size**2
        pv = np.random.default_rng(0).standard_normal((64, D)).astype(np.float32)
        feats = model.vision_tower(model.params["vision_tower"], jnp.asarray(pv), **_aux_dev({k: aux[k] for k in ("rotary_freqs", "seg_full", "seg_win", "patch_perm", "reverse_index")}))
        assert feats.shape == (16, vc.out_hidden_size)

    def test_full_pipeline_generate(self, model):
        cfg = model.config
        vc = cfg.vision_config
        grid = np.asarray([[1, 4, 4]])
        aux = model.vision_aux_inputs(grid)
        D = vc.in_channels * vc.temporal_patch_size * vc.patch_size**2
        pv = np.random.default_rng(1).standard_normal((16, D)).astype(np.float32)
        ids = np.asarray(
            [[5, cfg.vision_start_token_id] + [cfg.image_token_id] * 4 + [9]]
        )
        embeds = jax.jit(model.get_input_embeddings)(
            model.params, jnp.asarray(ids), jnp.asarray(pv), **_aux_dev(aux)
        )
        pos, deltas = model.prepare_position_ids(ids, grid)
        toks = [
            int(t[0])
            for t, _ in generate_step(
                embeds, model, position_ids=pos, rope_deltas=deltas, max_tokens=4
            )
        ]
        assert len(toks) == 4


class TestWindowIsolation:
    def test_window_mask_blocks_cross_window_attention(self, model):
        """With no full-attn blocks, distant patches must not interact."""
        from mlx_vlm_tpu.utils.testing import (
            qwen2_5_vl_hf_weights,
            tiny_qwen2_5_vl_config,
        )
        from mlx_vlm_tpu.utils.loader import load_model_from_weights

        cfg = tiny_qwen2_5_vl_config()
        cfg["vision_config"]["fullatt_block_indexes"] = []  # window-only
        m2 = load_model_from_weights(cfg, qwen2_5_vl_hf_weights(cfg, 0), jnp.float32)
        vc = m2.config.vision_config
        grid = np.asarray([[1, 8, 8]])
        aux = m2.vision_aux_inputs(grid)
        D = vc.in_channels * vc.temporal_patch_size * vc.patch_size**2
        rng = np.random.default_rng(2)
        pv1 = rng.standard_normal((64, D)).astype(np.float32)
        pv2 = pv1.copy()
        # perturb the last window's patches (original positions of window w
        # found via patch_perm/seg_win)
        last_win = aux["seg_win"].max()
        win_patches_windowed = np.nonzero(aux["seg_win"] == last_win)[0]
        orig_positions = aux["patch_perm"][win_patches_windowed]
        pv2[orig_positions] = rng.standard_normal((len(orig_positions), D))
        dev = {k: jnp.asarray(aux[k]) for k in ("rotary_freqs", "seg_full", "seg_win", "patch_perm", "reverse_index")}
        f1 = m2.vision_tower(m2.params["vision_tower"], jnp.asarray(pv1), **dev)
        f2 = m2.vision_tower(m2.params["vision_tower"], jnp.asarray(pv2), **dev)
        # merged tokens outside the perturbed window unchanged
        changed = np.abs(np.asarray(f1) - np.asarray(f2)).max(axis=1) > 1e-6
        assert changed.sum() == 4  # one 2x2-merged-token window changed
