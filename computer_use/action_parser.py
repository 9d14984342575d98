"""GUI action parsing for the computer-use agent.

Role parity: reference computer_use/action_parser.py — tolerant parsing of
model-emitted actions: raw dicts, JSON, Python-literal dict strings, and
code-fenced blocks, extracting the outermost {...} span."""

from __future__ import annotations

import ast
import json
from typing import Any, Dict

VALID_ACTIONS = ("CLICK", "INPUT", "SELECT", "HOVER", "ANSWER", "ENTER",
                 "SCROLL", "SELECT_TEXT", "COPY")


def parse_action_response(response) -> Dict[str, Any]:
    """Parse a GUI action emitted as JSON or a Python-style dict string."""
    if isinstance(response, dict):
        return response
    if not isinstance(response, str):
        raise TypeError(
            f"Expected a string or dict response, got {type(response).__name__}")

    response = response.strip()
    if response.startswith("```"):
        lines = response.splitlines()
        if lines and lines[0].startswith("```"):
            lines = lines[1:]
        if lines and lines[-1].startswith("```"):
            lines = lines[:-1]
        response = "\n".join(lines).strip()

    start = response.find("{")
    end = response.rfind("}")
    if start != -1 and end != -1 and start < end:
        response = response[start:end + 1]

    try:
        parsed = json.loads(response)
    except json.JSONDecodeError:
        parsed = ast.literal_eval(response)

    if not isinstance(parsed, dict):
        raise ValueError(
            f"Expected action response to parse to a dict, "
            f"got {type(parsed).__name__}")
    return parsed


def scale_position(action: Dict[str, Any], width: int, height: int
                   ) -> Dict[str, Any]:
    """Scale normalized [0,1] positions to pixel coordinates; handles both
    a single [x, y] and a [[x1, y1], [x2, y2]] span (SELECT_TEXT)."""
    pos = action.get("position")
    if pos is None:
        return action
    out = dict(action)
    if pos and isinstance(pos[0], (list, tuple)):
        out["position"] = [[p[0] * width, p[1] * height] for p in pos]
    else:
        out["position"] = [pos[0] * width, pos[1] * height]
    return out


def validate_action(action: Dict[str, Any]) -> Dict[str, Any]:
    """Check the action name and required fields; returns the action."""
    name = str(action.get("action", "")).upper()
    if name not in VALID_ACTIONS:
        raise ValueError(f"unknown action {action.get('action')!r}; "
                         f"expected one of {VALID_ACTIONS}")
    needs_pos = name in ("CLICK", "INPUT", "SELECT", "HOVER", "SELECT_TEXT")
    if needs_pos and action.get("position") is None:
        raise ValueError(f"{name} requires a position")
    if name in ("INPUT", "ANSWER", "SCROLL", "COPY") and \
            action.get("value") is None:
        raise ValueError(f"{name} requires a value")
    return {**action, "action": name}
