"""Chat templating.

Role parity: reference `mlx_vlm/prompt_utils.py` — get_message_json:520,
apply_chat_template:794.  This first cut covers the Qwen-VL family message
shape and defers to the processor/tokenizer Jinja template when present.
"""

from __future__ import annotations

from typing import List, Optional, Union


def get_message_json(
    model_type: str,
    prompt: str,
    role: str = "user",
    skip_image_token: bool = False,
    num_images: int = 1,
    num_audios: int = 0,
    **kwargs,
) -> dict:
    """Build one chat message with the model family's media placeholders."""
    content: List[dict] = []
    if not skip_image_token:
        for _ in range(num_images):
            content.append({"type": "image"})
    content.append({"type": "text", "text": prompt})
    return {"role": role, "content": content}


def apply_chat_template(
    processor,
    config: Union[dict, object],
    prompt: Union[str, List[dict]],
    add_generation_prompt: bool = True,
    num_images: int = 1,
    num_audios: int = 0,
    **kwargs,
) -> str:
    model_type = (
        config.get("model_type") if isinstance(config, dict) else getattr(config, "model_type", "")
    )
    if isinstance(prompt, str):
        messages = [get_message_json(model_type, prompt, num_images=num_images)]
    else:
        messages = prompt
    tmpl_owner = processor
    if not hasattr(tmpl_owner, "apply_chat_template") and hasattr(
        processor, "tokenizer"
    ):
        tmpl_owner = processor.tokenizer
    try:
        return tmpl_owner.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=add_generation_prompt
        )
    except Exception:
        # basic Qwen-style fallback
        out = []
        for m in messages:
            parts = m["content"]
            if isinstance(parts, str):
                body = parts
            else:
                body = ""
                for p in parts:
                    if p.get("type") == "image":
                        body += "<|vision_start|><|image_pad|><|vision_end|>"
                    elif p.get("type") == "video":
                        body += "<|vision_start|><|video_pad|><|vision_end|>"
                    else:
                        body += p.get("text", "")
            out.append(f"<|im_start|>{m['role']}\n{body}<|im_end|>\n")
        if add_generation_prompt:
            out.append("<|im_start|>assistant\n")
        return "".join(out)
