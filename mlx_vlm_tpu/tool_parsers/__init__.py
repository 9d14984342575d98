"""Tool-call parsing registry.

Role parity: reference mlx_vlm/tool_parsers/ — chat-template marker
sniffing selects a per-family parser module (tool_parsers/__init__.py:11-25;
families incl. qwen/hermes, mistral, pythonic, json_tools).
"""

from __future__ import annotations

from typing import List, Optional

from .hermes import HermesToolParser
from .json_tools import JsonToolParser
from .mistral import MistralToolParser
from .pythonic import PythonicToolParser

_PARSERS = {
    "hermes": HermesToolParser,
    "qwen": HermesToolParser,
    "mistral": MistralToolParser,
    "pythonic": PythonicToolParser,
    "json": JsonToolParser,
}

# markers in a chat template that identify the family
_TEMPLATE_MARKERS = [
    ("<tool_call>", "hermes"),
    ("[TOOL_CALLS]", "mistral"),
    ("<|python_tag|>", "pythonic"),
]


def get_tool_parser(name_or_template: Optional[str] = None):
    """Parser by explicit name, or sniffed from a chat template string."""
    if name_or_template in _PARSERS:
        return _PARSERS[name_or_template]()
    if name_or_template:
        for marker, family in _TEMPLATE_MARKERS:
            if marker in name_or_template:
                return _PARSERS[family]()
    return JsonToolParser()


def parse_tool_calls(text: str, parser=None) -> tuple:
    """Returns (clean_text, [ {name, arguments}, ... ])."""
    parser = parser or JsonToolParser()
    return parser.parse(text)
