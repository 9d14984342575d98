"""Tracing/profiling hooks (SURVEY §5 row 64)."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.utils.profiling import (PhaseTimer, annotate,
                                         global_phases, trace_if_enabled)


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        snap = t.snapshot()
        assert snap["a"]["count"] == 2
        assert snap["b"]["count"] == 1
        assert snap["a"]["total_s"] >= 0

    def test_annotate_records_and_traces(self):
        t = PhaseTimer()
        with annotate("prefill", t):
            jnp.ones(4).block_until_ready()
        assert t.snapshot()["prefill"]["count"] == 1

    def test_trace_disabled_without_env(self, monkeypatch):
        monkeypatch.delenv("MLX_VLM_TPU_PROFILE_DIR", raising=False)
        with trace_if_enabled() as active:
            assert active is False

    def test_trace_writes_files(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MLX_VLM_TPU_PROFILE_DIR", str(tmp_path))
        with trace_if_enabled("unit") as active:
            assert active is True
            jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
        files = list(tmp_path.rglob("*"))
        assert any(f.is_file() for f in files)


class TestGenerateIntegration:
    def test_stream_generate_populates_phases(self):
        from mlx_vlm_tpu.generate.dispatch import stream_generate
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        class _FakeTok:
            eos_token_id = 199
            vocab = {}

            def decode(self, ids, **kw):
                return "".join(chr(97 + (i % 26)) for i in ids)

            def __call__(self, text, **kw):
                ids = [(ord(c) * 7) % 200 for c in str(text)][:24]
                return {"input_ids": np.asarray([ids]),
                        "attention_mask": np.ones((1, len(ids)), np.int64)}

        class _Proc:
            tokenizer = _FakeTok()

            def __call__(self, text=None, images=None, videos=None, **kw):
                return self.tokenizer(
                    text[0] if isinstance(text, list) else text)

        global_phases().reset()
        model = make_tiny_qwen2_vl(seed=0, dtype=jnp.float32)
        proc = _Proc()
        out = list(stream_generate(model, proc, "hello world",
                                   max_tokens=3))
        assert out
        snap = global_phases().snapshot()
        assert snap.get("prefill", {}).get("count", 0) >= 1
        assert snap.get("decode", {}).get("count", 0) >= 1
