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


class TestSchemaAutomaton:
    """Real JSON-schema enforcement (reference structured.py:262 compiles
    the schema via llguidance; here a pure-Python schema walker)."""

    SCHEMA = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "color": {"enum": ["red", "green", "blue"]},
            "count": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"},
                     "maxItems": 2},
        },
        "required": ["name", "color"],
        "additionalProperties": False,
    }

    @pytest.mark.parametrize("text", [
        "", "{", '{"', '{"na', '{"name"', '{"name": "x"',
        '{"name": "x", "color": "re',
        '{"name": "x", "color": "red"}',
        '{"name": "x", "color": "red", "count": 3}',
        '{"name": "x", "color": "red", "tags": ["a"]}',
        '  {"name": "x", "color": "blue", "count": -12',
    ])
    def test_schema_prefixes_valid(self, text):
        from mlx_vlm_tpu.structured import schema_prefix_valid
        assert schema_prefix_valid(text, self.SCHEMA), text

    @pytest.mark.parametrize("text", [
        "[",                       # root type
        '"x"',                     # root type
        "3",                       # root type
        '{"bogus',                 # additionalProperties: false, no match
        '{"name": 1',              # property type
        '{"color": "yellow"',      # off-enum complete string
        '{"color": "gre_',         # not a prefix of any enum value
        '{"name": "x"}',           # closes with required "color" missing
        '{"count": 1.5}',          # integer violated at value completion
        '{"count": tru',           # integer property, boolean literal
        '{"tags": ["a", "b", "c"',  # maxItems
        '{"name": "x", "name":',   # duplicate key
        '{"name": "x", "color": "red"} x',  # trailing garbage
    ])
    def test_schema_prefixes_invalid(self, text):
        from mlx_vlm_tpu.structured import schema_prefix_valid
        assert not schema_prefix_valid(text, self.SCHEMA), text

    def test_integer_exponent_form(self):
        from mlx_vlm_tpu.structured import schema_complete
        assert schema_complete('{"name":"x","color":"red","count":1e2}',
                               self.SCHEMA)
        assert not schema_complete('{"name":"x","color":"red","count":1.5}',
                                   self.SCHEMA)

    def test_anyof_and_const(self):
        from mlx_vlm_tpu.structured import (
            schema_complete, schema_prefix_valid)
        sch = {"anyOf": [{"type": "string"}, {"const": 42}]}
        assert schema_prefix_valid('"hel', sch)
        assert schema_prefix_valid("4", sch)
        assert schema_complete("42 ", sch)
        assert not schema_prefix_valid("true", sch)
        assert not schema_prefix_valid("41 ", sch)

    def test_positional_items(self):
        from mlx_vlm_tpu.structured import schema_prefix_valid
        sch = {"type": "array",
               "items": [{"type": "integer"}, {"type": "string"}]}
        assert schema_prefix_valid('[1, "a"]', sch)
        assert not schema_prefix_valid('["a"', sch)

    def _greedy_walk(self, schema, favored, vocab, max_steps=64):
        """Drive JSONLogitsProcessor with logits always favoring `favored`
        (an off-schema token); return the final text."""
        class Tok:
            def decode(self, ids, **kw):
                return "".join(vocab[i] for i in ids)

        from mlx_vlm_tpu.structured import JSONLogitsProcessor
        proc = JSONLogitsProcessor(Tok(), schema, beam=len(vocab))
        rng = np.random.default_rng(0)
        for _ in range(max_steps):
            logits = rng.standard_normal(len(vocab)).astype(np.float32)
            logits[favored] += 20.0  # off-schema token always argmax
            proc.choose(logits)
            if proc.done:
                break
        return proc

    def test_required_and_enum_enforced_on_sampled_output(self):
        import json as _json
        vocab = ['{', '}', '"name"', '"color"', '"x"', '"red"', '"green"',
                 '"yellow"', ':', ',', ' ', 'hello', '[', ']']
        favored = vocab.index('hello')
        schema = {
            "type": "object",
            "properties": {"name": {"type": "string"},
                           "color": {"enum": ["red", "green", "blue"]}},
            "required": ["name", "color"],
            "additionalProperties": False,
        }
        proc = self._greedy_walk(schema, favored, vocab)
        assert proc.done, proc.text
        obj = _json.loads(proc.text)
        assert set(obj) <= {"name", "color"}
        assert "name" in obj and obj["color"] in ("red", "green", "blue")
        assert "hello" not in proc.text

    def test_off_schema_token_rejected_midway(self):
        from mlx_vlm_tpu.structured import JSONLogitsProcessor

        vocab = ['{', '}', '"a"', '"b"', ':', '1', '2', 'true']
        class Tok:
            def decode(self, ids, **kw):
                return "".join(vocab[i] for i in ids)

        schema = {"type": "object", "properties": {"a": {"type": "integer"}},
                  "required": ["a"], "additionalProperties": False}
        proc = JSONLogitsProcessor(Tok(), schema, beam=len(vocab))
        proc.text = '{"a":'
        # logits favor `true` (type violation) then `"b"` (closed key set):
        # the automaton must fall through to an integer
        logits = np.zeros(len(vocab), np.float32)
        logits[vocab.index('true')] = 9.0
        logits[vocab.index('"b"')] = 8.0
        logits[vocab.index('1')] = 1.0
        tid = proc.choose(logits)
        assert vocab[tid] in ('1', '2')


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
