"""Streaming detokenization.

Role parity: reference `mlx_vlm/tokenizer_utils.py` — StreamingDetokenizer:19,
SPMStreamingDetokenizer:121, BPEStreamingDetokenizer:200, load_tokenizer:453.

This first cut is the Naive variant: decode a bounded trailing segment and
emit only the stable prefix (never emits partial UTF-8 / partial BPE merges).
"""

from __future__ import annotations

from typing import List

__all__ = ["StreamingDetokenizer", "load_tokenizer"]

_REPLACEMENT = "�"


class StreamingDetokenizer:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self._ids: List[int] = []
        self._emitted = ""
        self.text = ""

    def reset(self):
        self._ids = []
        self._emitted = ""
        self.text = ""

    def add_token(self, token: int):
        self._ids.append(int(token))

    def last_segment(self) -> str:
        """Return newly-stable text since the last call."""
        s = self.tokenizer.decode(self._ids, skip_special_tokens=False)
        if s.endswith(_REPLACEMENT):  # mid-codepoint; wait for more tokens
            return ""
        new = s[len(self._emitted) :]
        self._emitted = s
        self.text += new
        # bound cost: reset the window at newlines (emitted text is final)
        if s.endswith("\n"):
            self._ids = []
            self._emitted = ""
        return new

    def finalize(self) -> str:
        s = self.tokenizer.decode(self._ids, skip_special_tokens=False)
        new = s[len(self._emitted) :]
        self._emitted = s
        self.text += new
        return new


def load_tokenizer(model_path, **kwargs):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(str(model_path), **kwargs)
