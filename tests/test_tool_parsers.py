from mlx_vlm_tpu.tool_parsers import get_tool_parser, parse_tool_calls
from mlx_vlm_tpu.tool_parsers.hermes import HermesToolParser
from mlx_vlm_tpu.tool_parsers.mistral import MistralToolParser
from mlx_vlm_tpu.tool_parsers.pythonic import PythonicToolParser


class TestHermes:
    def test_single_call(self):
        text = 'Sure.\n<tool_call>\n{"name": "get_weather", "arguments": {"city": "Paris"}}\n</tool_call>'
        clean, calls = HermesToolParser().parse(text)
        assert calls == [{"name": "get_weather", "arguments": {"city": "Paris"}}]
        assert clean == "Sure."

    def test_multiple_calls(self):
        text = (
            '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>'
        )
        _, calls = HermesToolParser().parse(text)
        assert [c["name"] for c in calls] == ["a", "b"]

    def test_no_call(self):
        clean, calls = HermesToolParser().parse("just text")
        assert calls == [] and clean == "just text"


class TestMistral:
    def test_call(self):
        text = '[TOOL_CALLS] [{"name": "f", "arguments": {"a": 2}}]'
        clean, calls = MistralToolParser().parse(text)
        assert calls[0]["name"] == "f" and calls[0]["arguments"] == {"a": 2}


class TestPythonic:
    def test_call(self):
        _, calls = PythonicToolParser().parse('[get_time(tz="UTC")]')
        assert calls == [{"name": "get_time", "arguments": {"tz": "UTC"}}]

    def test_plain_text_passthrough(self):
        clean, calls = PythonicToolParser().parse("hello world")
        assert calls == [] and clean == "hello world"


class TestRegistry:
    def test_sniff_from_template(self):
        assert isinstance(get_tool_parser("uses <tool_call> marker"), HermesToolParser)
        assert isinstance(get_tool_parser("has [TOOL_CALLS] inside"), MistralToolParser)

    def test_json_fallback(self):
        clean, calls = parse_tool_calls('{"name": "go", "arguments": {}}')
        assert calls[0]["name"] == "go"
