"""Drafter checkpoint split tooling + parity check.

Parity: reference mlx_vlm/speculative/drafters/*/split.py and
qwen3_dflash/parity_check.py."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.speculative.split import (
    SPLIT_RULES,
    resolve_rule,
    split_drafter,
    verify_split,
)

D, I, V = 64, 128, 256  # matches utils.testing tiny qwen2_vl dims


def _mtp_tensors(prefix: str, rng) -> dict:
    def rand(*sh):
        return (rng.standard_normal(sh) * 0.05).astype(np.float32)

    w = {
        prefix + "enorm.weight": np.ones(D, np.float32),
        prefix + "hnorm.weight": np.ones(D, np.float32),
        prefix + "eh_proj.weight": rand(D, 2 * D),
        prefix + "norm.weight": np.ones(D, np.float32),
        prefix + "layers.0.input_layernorm.weight": np.ones(D, np.float32),
        prefix + "layers.0.post_attention_layernorm.weight":
            np.ones(D, np.float32),
        prefix + "layers.0.self_attn.q_proj.weight": rand(D, D),
        prefix + "layers.0.self_attn.k_proj.weight": rand(32, D),
        prefix + "layers.0.self_attn.v_proj.weight": rand(32, D),
        prefix + "layers.0.self_attn.o_proj.weight": rand(D, D),
        prefix + "layers.0.mlp.gate_proj.weight": rand(I, D),
        prefix + "layers.0.mlp.up_proj.weight": rand(I, D),
        prefix + "layers.0.mlp.down_proj.weight": rand(D, I),
    }
    return w


def _write_source(tmp_path, model_type="qwen3_5", prefix="mtp.", extra=None):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    src = tmp_path / "source"
    src.mkdir()
    tensors = _mtp_tensors(prefix, rng)
    # decoy tensors that must NOT be extracted
    tensors["model.embed_tokens.weight"] = np.zeros((V, D), np.float32)
    tensors["model.layers.0.self_attn.q_proj.weight"] = np.zeros(
        (D, D), np.float32)
    if extra:
        tensors.update(extra)
    save_file(tensors, str(src / "model.safetensors"))
    cfg = {
        "model_type": model_type,
        "text_config": {
            "hidden_size": D, "intermediate_size": I,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "vocab_size": V, "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
            "num_hidden_layers": 2,
        },
    }
    (src / "config.json").write_text(json.dumps(cfg))
    (src / "tokenizer_config.json").write_text("{}")
    return src


class TestRules:
    def test_known_families(self):
        assert resolve_rule("qwen3_5").drafter_type == "qwen3_5_mtp"
        assert resolve_rule("inkling").drafter_type == "inkling_mtp"
        assert resolve_rule("glm4_moe").drafter_type == "glm4_moe_lite_mtp"
        with pytest.raises(ValueError):
            resolve_rule("llama")

    def test_canonical_renames(self):
        r = SPLIT_RULES["qwen3_5"]
        cfg = {}
        assert (r.strip("mtp.layers.0.self_attn.q_proj.weight", cfg)
                == "model.layer.self_attn.q_proj.weight")
        assert r.strip("mtp.shared_head.norm.weight", cfg) \
            == "model.norm.weight"
        assert r.strip("mtp.shared_head.head.weight", cfg) \
            == "model.lm_head.weight"

    def test_nextn_dynamic_prefix(self):
        r = SPLIT_RULES["glm4_moe"]
        cfg = {"text_config": {"num_hidden_layers": 46}}
        assert r.wanted("model.layers.46.eh_proj.weight", cfg)
        assert not r.wanted("model.layers.45.eh_proj.weight", cfg)
        assert (r.strip("model.layers.46.shared_head.head.weight", cfg)
                == "model.lm_head.weight")


class TestSplit:
    def test_split_and_verify(self, tmp_path):
        src = _write_source(tmp_path)
        out = split_drafter(str(src), str(tmp_path / "drafter"))
        cfg = json.loads((out / "config.json").read_text())
        assert cfg["model_type"] == "qwen3_5_mtp"
        assert cfg["hidden_size"] == D and cfg["vocab_size"] == V
        assert (out / "tokenizer_config.json").exists()

        from safetensors import safe_open

        with safe_open(str(out / "model.safetensors"),
                       framework="numpy") as sf:
            keys = set(sf.keys())
        assert "model.layer.self_attn.q_proj.weight" in keys
        assert "model.enorm.weight" in keys
        assert not any("embed_tokens" in k for k in keys)  # decoy excluded

        report = verify_split(str(src), str(out))
        assert report["ok"] and report["tensors"] == 13

    def test_verify_detects_corruption(self, tmp_path):
        from safetensors import safe_open
        from safetensors.numpy import save_file

        src = _write_source(tmp_path)
        out = split_drafter(str(src), str(tmp_path / "drafter"))
        with safe_open(str(out / "model.safetensors"),
                       framework="numpy") as sf:
            tensors = {k: sf.get_tensor(k) for k in sf.keys()}
        tensors["model.enorm.weight"] = tensors["model.enorm.weight"] + 1
        save_file(tensors, str(out / "model.safetensors"))
        with pytest.raises(ValueError, match="parity failed"):
            verify_split(str(src), str(out))

    def test_inkling_extra_norm(self, tmp_path):
        src = _write_source(
            tmp_path, model_type="inkling", prefix="model.mtp.",
            extra={"model.llm.norm.weight": np.full(D, 2.0, np.float32)})
        out = split_drafter(str(src), str(tmp_path / "drafter"))
        from safetensors import safe_open

        with safe_open(str(out / "model.safetensors"),
                       framework="numpy") as sf:
            # the family rule pulls the LLM final norm in as the drafter
            # norm (overriding the mtp-internal one is fine: both written,
            # extras win by exact-key match)
            assert "model.norm.weight" in set(sf.keys())
        assert verify_split(str(src), str(out))["ok"]


class TestLoadRoundTrip:
    def test_split_output_loads_and_drafts(self, tmp_path):
        """The split directory feeds --draft-model: load_drafter consumes
        it against a tiny target and one jitted draft round runs."""
        from mlx_vlm_tpu.speculative.drafters import load_drafter
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        src = _write_source(tmp_path)
        out = split_drafter(str(src), str(tmp_path / "drafter"))
        target = make_tiny_qwen2_vl(seed=3)
        drafter, params, kind = load_drafter(str(out), target)
        assert kind == "mtp"
        assert "embed_tokens" in params and "lm_head" in params  # shared
        cache = drafter.init_cache(1, 64, jnp.float32)
        tok = jnp.asarray([5], jnp.int32)
        feat = jnp.zeros((1, D), jnp.float32)
        toks, cache = drafter.draft_fn(3)(params, cache, tok, feat,
                                          jnp.asarray(0, jnp.int32))
        assert toks.shape == (1, 3)
        assert int(cache.offset) == 3
