"""Computer-use agent surfaces: action parsing, prompt building, history.

Parity: reference computer_use/action_parser.py + gui_agent.py."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "computer_use"))

from action_parser import (  # noqa: E402
    VALID_ACTIONS,
    parse_action_response,
    scale_position,
    validate_action,
)


class TestActionParser:
    def test_raw_dict_passthrough(self):
        a = {"action": "ENTER", "value": None, "position": None}
        assert parse_action_response(a) is a

    def test_json_string(self):
        a = parse_action_response(
            '{"action": "CLICK", "value": null, "position": [0.5, 0.25]}')
        assert a["action"] == "CLICK" and a["position"] == [0.5, 0.25]

    def test_python_literal(self):
        a = parse_action_response(
            "{'action': 'INPUT', 'value': 'hello', 'position': [0.1, 0.9]}")
        assert a["value"] == "hello"

    def test_code_fenced_with_chatter(self):
        text = ("Sure! Here is the action:\n```json\n"
                '{"action": "SCROLL", "value": "down", "position": null}\n'
                "```")
        a = parse_action_response(text)
        assert a["action"] == "SCROLL" and a["value"] == "down"

    def test_rejects_non_dict(self):
        with pytest.raises((ValueError, SyntaxError)):
            parse_action_response("[1, 2, 3]")
        with pytest.raises(TypeError):
            parse_action_response(42)

    def test_scale_single_and_span(self):
        a = scale_position({"action": "CLICK", "position": [0.5, 0.5]},
                           200, 100)
        assert a["position"] == [100.0, 50.0]
        b = scale_position(
            {"action": "SELECT_TEXT",
             "position": [[0.0, 0.0], [1.0, 0.5]]}, 200, 100)
        assert b["position"] == [[0.0, 0.0], [200.0, 50.0]]
        c = scale_position({"action": "ENTER", "position": None}, 200, 100)
        assert c["position"] is None

    def test_validate(self):
        ok = validate_action({"action": "click", "position": [0.1, 0.2]})
        assert ok["action"] == "CLICK"
        with pytest.raises(ValueError, match="unknown action"):
            validate_action({"action": "FROB"})
        with pytest.raises(ValueError, match="requires a position"):
            validate_action({"action": "CLICK", "position": None})
        with pytest.raises(ValueError, match="requires a value"):
            validate_action({"action": "ANSWER"})
        assert len(VALID_ACTIONS) == 9  # reference action space


class TestAgentPlumbing:
    def test_prompt_includes_action_space_and_history(self):
        import gui_agent

        prompt = gui_agent.build_prompt(
            "open the settings", [{"action": "CLICK"}])
        assert "`CLICK`" in prompt and "`SELECT_TEXT`" in prompt
        assert "Task: open the settings" in prompt
        assert '"action": "CLICK"' in prompt
        assert "scaled to a range of 0-1" in prompt

    def test_history_csv(self, tmp_path):
        import gui_agent

        csv_path = tmp_path / "nav.csv"
        gui_agent.navigation_history_append(
            "task", {"action": "ENTER"}, "s.png", csv_path=str(csv_path))
        gui_agent.navigation_history_append(
            "task2", {"action": "CLICK"}, "s2.png", csv_path=str(csv_path))
        lines = csv_path.read_text().strip().splitlines()
        assert lines[0].startswith("Query")
        assert len(lines) == 3 and "CLICK" in lines[2]

    def test_examples_parse(self):
        """examples/ scripts must at least be valid Python."""
        import ast as _ast

        root = Path(__file__).parent.parent / "examples"
        files = sorted(root.glob("*.py"))
        assert files, "examples/ is empty"
        for f in files:
            _ast.parse(f.read_text())
