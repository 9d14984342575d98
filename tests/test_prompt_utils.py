"""Per-family chat-template shape tests.

Contract parity with reference mlx_vlm/prompt_utils.py: each implemented
family's message shape (placeholder kind + placement) must match what the
family's HF processor template expects (reference MODEL_CONFIG:33 and the
MessageFormatter builders:238).
"""

import pytest

from mlx_vlm_tpu.prompt_utils import (apply_chat_template,
                                      extract_text_from_content,
                                      get_message_json)


def _types(msg):
    return [p["type"] for p in msg["content"]]


class TestFamilyShapes:
    def test_parts_image_after(self):
        # qwen2_vl / llava / mllama class: text part first, image parts after
        for fam in ["qwen2_vl", "llava", "mllama", "kimi_vl", "llama4",
                    "aya_vision", "idefics2"]:
            m = get_message_json(fam, "hi", num_images=1)
            assert _types(m) == ["text", "image"], fam
            assert m["content"][0]["text"] == "hi"
            assert m["content"][0]["content"] == "hi"

    def test_parts_image_first(self):
        for fam in ["qwen2_5_vl", "qwen3_vl", "qwen3_vl_moe", "idefics3",
                    "mistral3", "glm4v", "dots_ocr", "lfm2_vl", "smolvlm",
                    "minimax_m3_vl", "hunyuan_vl"]:
            m = get_message_json(fam, "hi", num_images=2)
            assert _types(m) == ["image", "image", "text"], fam

    def test_ernie_image_url(self):
        m = get_message_json("ernie4_5_moe_vl", "hi", num_images=1)
        assert _types(m) == ["image_url", "text"]

    def test_typed_list_assistant_flattens(self):
        m = get_message_json("internvl_chat", "ok", role="assistant")
        assert m["content"] == "ok"
        m = get_message_json("pixtral", "ok", role="assistant", num_images=1)
        assert m["content"] == "ok"
        u = get_message_json("internvl_chat", "q", num_images=1)
        assert _types(u) == ["image", "text"]

    def test_gemma3_token_after_text(self):
        m = get_message_json("gemma3", "look", num_images=2)
        assert m["content"] == "look<start_of_image><start_of_image>"

    def test_inline_newline_families(self):
        for fam in ["deepseek_vl_v2", "llava_qwen2", "deepseekocr"]:
            m = get_message_json(fam, "q", num_images=2)
            assert m["content"] == "<image>\n<image>\nq", fam

    def test_minicpm_wrapped(self):
        m = get_message_json("minicpm", "q", num_images=1)
        assert m["content"] == "(<image>./</image>)\nq"

    def test_single_image_token_no_repeat(self):
        m = get_message_json("unlimited-ocr", "q", num_images=3)
        assert m["content"] == "<image>q"

    def test_phi_numbered_tokens(self):
        m = get_message_json("phi3_v", "q", num_images=2, num_audios=1)
        assert m["content"] == "<|image_1|><|image_2|><|audio_1|>q"

    def test_bare_prompt_families(self):
        assert get_message_json("molmo", "describe") == "describe"
        assert get_message_json("florence2", "<OCR>") == "<OCR>"
        assert (get_message_json("paligemma", "cap ", num_images=1)
                == "cap <start_of_image>")

    def test_audio_parts_appended(self):
        m = get_message_json("qwen3_omni_moe", "q", num_images=1,
                             num_audios=2)
        assert _types(m) == ["image", "text", "audio", "audio"]

    def test_video_message(self):
        m = get_message_json("qwen2_5_vl", "what", video="clip.mp4", fps=2)
        assert m["content"][0]["type"] == "video"
        assert m["content"][0]["video"] == "clip.mp4"
        assert m["content"][0]["fps"] == 2
        assert m["content"][-1]["text"] == "what"

    def test_video_fps_mismatch_raises(self):
        with pytest.raises(ValueError):
            get_message_json("qwen2_vl", "x", video=["a.mp4", "b.mp4"],
                             fps=[1, 2, 3])

    def test_single_image_only_raises(self):
        for fam in ["paligemma", "mllama", "llava_next"]:
            with pytest.raises(ValueError):
                get_message_json(fam, "x", num_images=2)

    def test_unknown_family_raises(self):
        with pytest.raises(ValueError):
            get_message_json("not_a_model", "x")

    def test_non_user_roles_skip_media(self):
        m = get_message_json("qwen2_vl", "sys", role="system", num_images=3)
        assert _types(m) == ["text"]


class TestExtractText:
    def test_str_passthrough(self):
        assert extract_text_from_content("abc") == "abc"

    def test_drops_image_url_payload(self):
        content = [
            {"type": "text", "text": "what is"},
            {"type": "image_url", "image_url": {"url": "data:xxx"}},
            {"type": "text", "text": "this?"},
        ]
        assert extract_text_from_content(content) == "what is this?"


class TestApplyChatTemplate:
    def test_string_prompt_qwen_fallback(self):
        # no processor template -> ChatML fallback with qwen vision triplet
        out = apply_chat_template(None, {"model_type": "qwen2_vl"}, "hello",
                                  num_images=1)
        assert out == ("<|im_start|>user\nhello"
                       "<|vision_start|><|image_pad|><|vision_end|>"
                       "<|im_end|>\n<|im_start|>assistant\n")

    def test_media_on_last_user_message_only(self):
        msgs = [
            {"role": "user", "content": "first"},
            {"role": "assistant", "content": "ok"},
            {"role": "user", "content": "second"},
        ]
        rendered = apply_chat_template(None, {"model_type": "qwen2_vl"},
                                       msgs, num_images=1,
                                       return_messages=True)
        assert rendered[0]["content"][0]["text"] == "first"
        assert [p["type"] for p in rendered[0]["content"]] == ["text"]
        assert [p["type"] for p in rendered[2]["content"]] == ["text",
                                                               "image"]

    def test_last_message_only_families(self):
        out = apply_chat_template(None, {"model_type": "paligemma"},
                                  "caption en", num_images=1)
        assert out == "caption en<start_of_image>"
        out = apply_chat_template(None, {"model_type": "molmo"}, "point",
                                  num_images=1)
        assert out == "point"

    def test_tool_call_passthrough_decodes_args(self):
        msgs = [
            {"role": "user", "content": "weather?"},
            {"role": "assistant", "tool_calls": [{
                "id": "1", "type": "function",
                "function": {"name": "get_weather",
                             "arguments": '{"city": "Paris"}'}}]},
            {"role": "tool", "tool_call_id": "1", "content": "22C"},
        ]
        rendered = apply_chat_template(None, {"model_type": "qwen2_vl"},
                                       msgs, num_images=0,
                                       return_messages=True)
        call = rendered[1]["tool_calls"][0]
        assert call["function"]["arguments"] == {"city": "Paris"}
        assert rendered[2]["role"] == "tool"

    def test_text_only_model_strips_media_parts(self):
        msgs = [{"role": "user", "content": [
            {"type": "text", "text": "hi"},
            {"type": "image_url", "image_url": {"url": "data:huge"}},
        ]}]
        rendered = apply_chat_template(None, {"model_type": "llama"}, msgs,
                                       num_images=0, return_messages=True)
        assert rendered[0]["content"] == "hi"

    def test_unknown_vlm_gets_generic_parts(self):
        rendered = apply_chat_template(None, {"model_type": "mystery_vl"},
                                       "q", num_images=1,
                                       return_messages=True)
        assert [p["type"] for p in rendered[0]["content"]] == ["text",
                                                               "image"]

    def test_hf_template_used_when_present(self):
        class Tok:
            chat_template = "stub"

            def apply_chat_template(self, messages, tokenize=False,
                                    add_generation_prompt=True, **kw):
                assert not tokenize
                return "TEMPLATED:" + messages[-1]["content"][0]["text"]

        class Proc:
            tokenizer = Tok()

        out = apply_chat_template(Proc(), {"model_type": "qwen2_vl"}, "yo",
                                  num_images=0)
        assert out == "TEMPLATED:yo"

    def test_enable_thinking_injected_when_supported(self):
        seen = {}

        class Tok:
            chat_template = "stub"

            def apply_chat_template(self, messages, tokenize=False,
                                    add_generation_prompt=True,
                                    enable_thinking=None, **kw):
                seen["enable_thinking"] = enable_thinking
                return "x"

        class Proc:
            tokenizer = Tok()

        apply_chat_template(Proc(), {"model_type": "qwen2_vl"}, "yo",
                            num_images=0)
        assert seen["enable_thinking"] is False
