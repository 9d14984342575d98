"""Constrained (structured-output) decoding.

Role parity: reference mlx_vlm/structured.py — llguidance-based JSON-schema
constrained decoding (build_json_schema_logits_processor:262,
LLGuidanceLogitsProcessor:53, ThinkingAwareLogitsProcessor:150,
`_apply_llguidance_mask`:24).

llguidance is not in this image, so the constraint engine is a pure-Python
incremental JSON prefix automaton.  The masking runs host-side through
`jax.experimental.io_callback` inside the (block_size=1) decode program —
the TPU computes logits, the host walks the automaton over the top-`beam`
candidates and returns the chosen token.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np

__all__ = [
    "json_prefix_valid",
    "JSONLogitsProcessor",
    "ThinkingAwareLogitsProcessor",
    "build_json_schema_logits_processor",
    "constrained_generate",
]

_WS = " \t\n\r"


def json_prefix_valid(text: str) -> bool:
    """True iff `text` is a prefix of at least one valid JSON document.

    Character-level pushdown automaton over objects/arrays/strings/numbers/
    literals — no regex, no parser-error introspection.
    """
    stack: List[str] = []  # '{' or '['
    i, n = 0, len(text)
    # modes: expect_value, after_value, expect_key, after_key, in_string...
    mode = "value"
    string_ctx = None  # "key" or "value" while inside a string

    def at_end(ok_modes):
        return True  # reaching end of input in any consistent state is fine

    while i < n:
        c = text[i]
        if mode == "string":
            if c == "\\":
                i += 2  # escape consumes next char (may run past end: fine)
                continue
            if c == '"':
                mode = "after_key" if string_ctx == "key" else "after_value"
            i += 1
            continue
        if mode == "number":
            if c in "0123456789+-.eE":
                i += 1
                continue
            mode = "after_value"
            continue  # re-examine c
        if mode == "literal":
            if c in "truefalsn" + "ul":  # chars of true/false/null
                i += 1
                continue
            mode = "after_value"
            continue
        if c in _WS:
            i += 1
            continue

        if mode == "value":
            if c == "{":
                stack.append("{")
                mode = "key_or_close"
            elif c == "[":
                stack.append("[")
                mode = "value_or_close"
            elif c == '"':
                mode = "string"
                string_ctx = "value"
            elif c in "-0123456789":
                mode = "number"
            elif c in "tfn":
                mode = "literal"
            else:
                return False
            i += 1
        elif mode == "value_or_close":
            if c == "]":
                if not stack or stack.pop() != "[":
                    return False
                mode = "after_value"
                i += 1
            else:
                mode = "value"
        elif mode == "key_or_close":
            if c == "}":
                if not stack or stack.pop() != "{":
                    return False
                mode = "after_value"
                i += 1
            elif c == '"':
                mode = "string"
                string_ctx = "key"
                i += 1
            else:
                return False
        elif mode == "after_key":
            if c == ":":
                mode = "value"
                string_ctx = None
                i += 1
            else:
                return False
        elif mode == "after_value":
            if not stack:
                return False  # trailing garbage after a complete document
            top = stack[-1]
            if c == ",":
                mode = "key" if top == "{" else "value"
                i += 1
            elif c == "}" and top == "{":
                stack.pop()
                mode = "after_value"
                i += 1
            elif c == "]" and top == "[":
                stack.pop()
                mode = "after_value"
                i += 1
            else:
                return False
        elif mode == "key":
            if c == '"':
                mode = "string"
                string_ctx = "key"
                i += 1
            else:
                return False
        else:  # pragma: no cover
            return False
    return True


def json_complete(text: str) -> bool:
    t = text.strip()
    if not t:
        return False
    try:
        json.loads(t)
        return True
    except json.JSONDecodeError:
        return False


class JSONLogitsProcessor:
    """Host-side constrained token chooser over the top-`beam` candidates.

    If no candidate keeps the output a valid JSON prefix, falls back to the
    unconstrained argmax (deadlock guard).
    """

    def __init__(self, tokenizer, schema: Optional[dict] = None, beam: int = 128):
        self.tokenizer = tokenizer
        self.schema = schema
        self.beam = beam
        self.text = ""
        self._decode_cache = {}

    def _tok_text(self, tid: int) -> str:
        s = self._decode_cache.get(tid)
        if s is None:
            s = self._decode_cache.setdefault(
                tid, self.tokenizer.decode([tid], skip_special_tokens=False)
            )
        return s

    _ROOT_CHARS = {"object": "{", "array": "[", "string": '"',
                   "number": "-0123456789", "boolean": "tf", "null": "n"}

    def _root_ok(self, text: str) -> bool:
        """Schema root-type constraint on the first non-whitespace char."""
        if not self.schema:
            return True
        allowed = self._ROOT_CHARS.get(self.schema.get("type", ""), None)
        if allowed is None:
            return True
        t = text.lstrip()
        return (not t) or t[0] in allowed

    def choose(self, logits_row: np.ndarray) -> int:
        order = np.argsort(-logits_row)[: self.beam]
        for tid in order:
            cand = self._tok_text(int(tid))
            new = self.text + cand
            if json_prefix_valid(new) and self._root_ok(new):
                self.text = new
                return int(tid)
        tid = int(order[0])
        self.text += self._tok_text(tid)
        return tid

    @property
    def done(self) -> bool:
        return json_complete(self.text)


class ThinkingAwareLogitsProcessor:
    """Defers constraints until after `</think>` (reference structured.py:150)."""

    def __init__(self, inner: JSONLogitsProcessor, think_end: str = "</think>"):
        self.inner = inner
        self.think_end = think_end
        self._seen = ""
        self.active = False

    def choose(self, logits_row: np.ndarray) -> int:
        if self.active:
            return self.inner.choose(logits_row)
        tid = int(np.argmax(logits_row))
        self._seen += self.inner._tok_text(tid)
        if self.think_end in self._seen:
            self.active = True
        return tid

    @property
    def done(self) -> bool:
        return self.active and self.inner.done


def build_json_schema_logits_processor(schema, tokenizer, beam: int = 128):
    """Reference structured.py:262."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    return JSONLogitsProcessor(tokenizer, schema, beam)


def make_constrained_sampler(proc: JSONLogitsProcessor):
    """Sampler usable inside the jitted decode step: logits come back to the
    host via ordered io_callback, the automaton picks the token."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import io_callback

    def host_choose(lg: np.ndarray) -> np.ndarray:
        return np.asarray([proc.choose(row) for row in np.asarray(lg)], np.int32)

    def sampler(logits, key):
        B = logits.shape[0]
        return io_callback(
            host_choose, jax.ShapeDtypeStruct((B,), jnp.int32), logits,
            ordered=True,
        )

    return sampler


def constrained_generate(model, processor, prompt: str, schema=None,
                         max_tokens: int = 512, **kwargs) -> str:
    """Greedy JSON-constrained generation (block_size=1 host loop)."""
    import jax
    import jax.numpy as jnp

    from .generate.ar import generate_step
    from .utils.processing import prepare_inputs

    tok = getattr(processor, "tokenizer", processor)
    proc = build_json_schema_logits_processor(schema, tok)
    sampler = make_constrained_sampler(proc)
    inputs = prepare_inputs(processor, prompt)
    embeds = jax.jit(model.get_input_embeddings)(
        model.params, jnp.asarray(inputs["input_ids"])
    )
    for t, _ in generate_step(
        embeds, model, max_tokens=max_tokens, sampler=sampler, block_size=1,
        **kwargs,
    ):
        if proc.done:
            break
    return proc.text
