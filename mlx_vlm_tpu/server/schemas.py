"""Request/response schemas (pydantic, lenient passthrough).

Role parity: reference mlx_vlm/server/schemas.py (FlexibleBaseModel:28).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, ConfigDict


class FlexibleBaseModel(BaseModel):
    model_config = ConfigDict(extra="allow")


class OpenAIMessage(FlexibleBaseModel):
    role: str
    content: Union[str, List[Dict[str, Any]], None] = None


class OpenAIChatRequest(FlexibleBaseModel):
    model: Optional[str] = None
    messages: List[OpenAIMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 0.0
    top_p: float = 1.0
    stream: bool = False
    stop: Optional[Union[str, List[str]]] = None
    seed: Optional[int] = None
    logprobs: Optional[bool] = None
    # {"type": "json_object"} or {"type": "json_schema",
    #  "json_schema": {"schema": {...}}} (OpenAI structured outputs)
    response_format: Optional[Dict[str, Any]] = None


class AnthropicContentBlock(FlexibleBaseModel):
    type: str
    text: Optional[str] = None
    source: Optional[Dict[str, Any]] = None


class AnthropicMessage(FlexibleBaseModel):
    role: str
    content: Union[str, List[AnthropicContentBlock]]


class AnthropicMessagesRequest(FlexibleBaseModel):
    model: Optional[str] = None
    messages: List[AnthropicMessage]
    system: Optional[Union[str, List[Dict[str, Any]]]] = None
    max_tokens: int = 512
    temperature: float = 0.0
    top_p: float = 1.0
    stream: bool = False
    stop_sequences: Optional[List[str]] = None
