import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_vlm_tpu.core.sampling import make_sampler
from mlx_vlm_tpu.core.stopping import StoppingCriteria
from mlx_vlm_tpu.structured import (
    JSONLogitsProcessor,
    json_complete,
    json_prefix_valid,
)


class TestJSONPrefixAutomaton:
    @pytest.mark.parametrize("text", [
        "", "{", '{"', '{"key', '{"key"', '{"key":', '{"key": 1',
        '{"key": 12.5e', '{"a": [1, 2', '{"a": [1, {"b": tr',
        '{"a": "hel\\', '[1, 2, 3', '{"a": null', "  {", '{"a":"x","b"',
        '{"nested": {"deep": ["v"',
    ])
    def test_valid_prefixes(self, text):
        assert json_prefix_valid(text), text

    @pytest.mark.parametrize("text", [
        "}", "{]", '{"a" 1', '{"a":}', "{,}", '{"a": 1}}', '[1,]x',
        '{"a": 1} trailing', "{1: 2", '{"a"::1',
    ])
    def test_invalid_prefixes(self, text):
        assert not json_prefix_valid(text), text

    def test_complete(self):
        assert json_complete('{"a": 1}')
        assert not json_complete('{"a": 1')


class TestConstrainedChooser:
    def test_forces_json(self):
        class Tok:
            vocab = ["hello", "{", "}", '"', "a", ":", "1", " ", ","]

            def decode(self, ids, **kw):
                return "".join(self.vocab[i] for i in ids)

        proc = JSONLogitsProcessor(Tok(), beam=9)
        # logits favor "hello" (invalid as JSON start) -> must pick "{"
        logits = np.array([10.0, 5.0, 0, 0, 0, 0, 0, 0, 0], np.float32)
        tid = proc.choose(logits)
        assert tid == 1
        assert proc.text == "{"
        # now "}" closes -> valid; "hello" still invalid
        logits2 = np.array([10.0, 0, 5.0, 0, 0, 0, 0, 0, 0], np.float32)
        tid2 = proc.choose(logits2)
        assert tid2 == 2
        assert proc.done

    def test_constrained_generate_end_to_end(self):
        from mlx_vlm_tpu.structured import constrained_generate
        from mlx_vlm_tpu.utils.testing import make_tiny_qwen2_vl

        class FakeTok:
            # tiny vocab mapped onto the model's 256-token space
            def decode(self, ids, **kw):
                table = {0: "{", 1: "}", 2: '"k"', 3: ":", 4: "7", 5: " "}
                return "".join(table.get(i % 6, "x") for i in ids)

            def __call__(self, text, **kw):
                return {"input_ids": np.asarray([[1, 2, 3]]),
                        "attention_mask": np.ones((1, 3), np.int64)}

        class FakeProc:
            tokenizer = FakeTok()

            def __call__(self, text=None, **kw):
                return self.tokenizer(text)

        model = make_tiny_qwen2_vl(seed=4, dtype=jnp.float32)
        out = constrained_generate(
            model, FakeProc(), "give me json", max_tokens=24,
            schema={"type": "object"},
        )
        assert json_prefix_valid(out)
        assert out.lstrip().startswith("{")


class TestSamplingExtras:
    def test_typical_p(self):
        s = make_sampler(temp=1.0, typical_p=0.5)
        logits = jnp.asarray([[5.0, 4.0, -10.0, -10.0]])
        toks = {int(s(logits, jax.random.PRNGKey(i))[0]) for i in range(40)}
        assert toks <= {0, 1}

    def test_xtc_drops_top(self):
        # with xtc_probability=1 and two tokens above threshold, the most
        # likely one must be excluded
        s = make_sampler(temp=1.0, xtc_probability=1.0, xtc_threshold=0.2)
        logits = jnp.asarray([[3.0, 2.5, -10.0, -10.0]])
        toks = {int(s(logits, jax.random.PRNGKey(i))[0]) for i in range(30)}
        assert toks == {1}


class TestStoppingCriteria:
    def test_eos_and_stop_words(self):
        sc = StoppingCriteria(eos_token_ids=[7], stop_words=["END"])
        assert sc.is_eos(7) and not sc.is_eos(8)
        assert sc.check_text("this is ") is None
        assert sc.check_text("the EN") is None
        assert sc.check_text("D of it") == "END"
