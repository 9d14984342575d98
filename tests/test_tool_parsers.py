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


TOOLS = [{"type": "function", "function": {
    "name": "get_weather",
    "parameters": {"type": "object", "properties": {
        "city": {"type": "string"},
        "days": {"type": "integer"},
        "units": {"type": "string"},
    }}}}]


class TestKimiK2:
    def test_call(self):
        from mlx_vlm_tpu.tool_parsers.kimi_k2 import KimiK2ToolParser

        text = ("ok<|tool_calls_section_begin|><|tool_call_begin|>"
                "functions.get_weather:0<|tool_call_argument_begin|>"
                '{"city": "Paris"}<|tool_call_end|>'
                "<|tool_calls_section_end|>")
        clean, calls = KimiK2ToolParser().parse(text)
        assert clean == "ok"
        assert calls == [{"name": "get_weather",
                          "arguments": {"city": "Paris"}}]

    def test_multiple(self):
        from mlx_vlm_tpu.tool_parsers.kimi_k2 import KimiK2ToolParser

        text = ("<|tool_call_begin|>a:0<|tool_call_argument_begin|>{}"
                "<|tool_call_end|><|tool_call_begin|>b:1"
                '<|tool_call_argument_begin|>{"x": 1}<|tool_call_end|>')
        _, calls = KimiK2ToolParser().parse(text)
        assert [c["name"] for c in calls] == ["a", "b"]
        assert calls[1]["arguments"] == {"x": 1}


class TestLongcat:
    def test_schema_typing(self):
        from mlx_vlm_tpu.tool_parsers.longcat import LongcatToolParser

        text = ("<longcat_tool_call>get_weather"
                "<longcat_arg_key>city</longcat_arg_key>"
                "<longcat_arg_value>Paris</longcat_arg_value>"
                "<longcat_arg_key>days</longcat_arg_key>"
                "<longcat_arg_value>3</longcat_arg_value>"
                "</longcat_tool_call>")
        _, calls = LongcatToolParser().parse(text, tools=TOOLS)
        assert calls[0]["arguments"] == {"city": "Paris", "days": 3}


class TestCohere2:
    def test_action_array(self):
        from mlx_vlm_tpu.tool_parsers.cohere2 import Cohere2ToolParser

        text = ('<|START_ACTION|>[{"tool_name": "get_weather", '
                '"parameters": {"city": "Nice"}}]<|END_ACTION|>')
        clean, calls = Cohere2ToolParser().parse(text)
        assert clean == ""
        assert calls == [{"name": "get_weather",
                          "arguments": {"city": "Nice"}}]

    def test_bad_escape_fixed(self):
        from mlx_vlm_tpu.tool_parsers.cohere2 import Cohere2ToolParser

        text = ('<|START_ACTION|>{"tool_name": "grep", '
                '"parameters": {"re": "a\\|b"}}<|END_ACTION|>')
        _, calls = Cohere2ToolParser().parse(text)
        assert calls[0]["arguments"]["re"] == "a|b"


class TestFunctionGemma:
    def test_escaped_strings_and_literals(self):
        from mlx_vlm_tpu.tool_parsers.function_gemma import \
            FunctionGemmaToolParser

        text = ("<start_function_call>call:get_weather{city:<escape>New "
                "York<escape>,days:2}<end_function_call>")
        _, calls = FunctionGemmaToolParser().parse(text)
        assert calls[0]["name"] == "get_weather"
        assert calls[0]["arguments"] == {"city": "New York", "days": 2}


class TestQwen3Coder:
    def test_schema_typing(self):
        from mlx_vlm_tpu.tool_parsers.qwen3_coder import Qwen3CoderToolParser

        text = ("<tool_call>\n<function=get_weather>\n"
                "<parameter=city>\nParis\n</parameter>\n"
                "<parameter=days>\n5\n</parameter>\n"
                "</function>\n</tool_call>")
        clean, calls = Qwen3CoderToolParser().parse(text, tools=TOOLS)
        assert clean == ""
        assert calls[0]["arguments"] == {"city": "Paris", "days": 5}


class TestGlm4:
    def test_pairs(self):
        from mlx_vlm_tpu.tool_parsers.glm4 import Glm4ToolParser

        text = ("<tool_call>get_weather\n"
                "<arg_key>city</arg_key><arg_value>Oslo</arg_value>\n"
                "<arg_key>days</arg_key><arg_value>7</arg_value>"
                "</tool_call>")
        _, calls = Glm4ToolParser().parse(text, tools=TOOLS)
        assert calls[0]["name"] == "get_weather"
        assert calls[0]["arguments"] == {"city": "Oslo", "days": 7}


class TestMinimax:
    def test_m2_invoke(self):
        from mlx_vlm_tpu.tool_parsers.minimax import MinimaxToolParser

        text = ('<minimax:tool_call>\n<invoke name="get_weather">\n'
                '<parameter name="city">Rome</parameter>\n'
                '<parameter name="days">2</parameter>\n'
                "</invoke>\n</minimax:tool_call>")
        clean, calls = MinimaxToolParser().parse(text, tools=TOOLS)
        assert clean == ""
        assert calls[0]["arguments"] == {"city": "Rome", "days": 2}

    def test_m3_namespaced(self):
        from mlx_vlm_tpu.tool_parsers.minimax import MinimaxToolParser

        text = (']<]minimax[>[<tool_call>]<]minimax[>[<invoke name="f">'
                ']<]minimax[>[</invoke>]<]minimax[>[</tool_call>')
        _, calls = MinimaxToolParser().parse(text)
        assert calls[0]["name"] == "f"


class TestGemma4:
    def test_escaped_and_nested(self):
        from mlx_vlm_tpu.tool_parsers.gemma4 import Gemma4ToolParser

        text = ('<|tool_call>call:get_weather{city:<|"|>San, '
                'Francisco<|"|>,days:3,opts:{units:<|"|>metric<|"|>}}'
                "<tool_call|>")
        _, calls = Gemma4ToolParser().parse(text)
        assert calls[0]["name"] == "get_weather"
        args = calls[0]["arguments"]
        assert args["city"] == "San, Francisco"
        assert args["days"] == 3
        assert args["opts"] == {"units": "metric"}


class TestRegistrySniffing:
    def test_new_markers(self):
        from mlx_vlm_tpu.tool_parsers import get_tool_parser
        from mlx_vlm_tpu.tool_parsers.cohere2 import Cohere2ToolParser
        from mlx_vlm_tpu.tool_parsers.gemma4 import Gemma4ToolParser
        from mlx_vlm_tpu.tool_parsers.glm4 import Glm4ToolParser
        from mlx_vlm_tpu.tool_parsers.kimi_k2 import KimiK2ToolParser
        from mlx_vlm_tpu.tool_parsers.minimax import MinimaxToolParser
        from mlx_vlm_tpu.tool_parsers.qwen3_coder import Qwen3CoderToolParser

        assert isinstance(get_tool_parser("x <|tool_calls_section_begin|>"),
                          KimiK2ToolParser)
        assert isinstance(get_tool_parser("x <|START_ACTION|>"),
                          Cohere2ToolParser)
        assert isinstance(get_tool_parser("x <|tool_call> y"),
                          Gemma4ToolParser)
        assert isinstance(get_tool_parser("<tool_call> with <arg_key>"),
                          Glm4ToolParser)
        assert isinstance(get_tool_parser("<tool_call><function=f>"),
                          Qwen3CoderToolParser)
        assert isinstance(get_tool_parser("uses minimax:tool_call"),
                          MinimaxToolParser)
