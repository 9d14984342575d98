"""HTTP server (stdlib ThreadingHTTPServer — this image has no
fastapi/uvicorn; the stdlib threaded server is dependency-free and each
request handler blocks only on its own token queue).

Role parity: reference mlx_vlm/server/app.py — endpoints /v1/chat/completions,
/v1/messages (+count_tokens), /v1/models, /health:799, /metrics:820,
/v1/cache/stats:829, API-key middleware, one-model registry.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from ..version import __version__
from .engine import ResponseGenerator

logger = logging.getLogger("mlx_vlm_tpu.server")


class ServerState:
    def __init__(self, model_name: str, generator: ResponseGenerator,
                 api_key: Optional[str] = None, registry=None,
                 image_service=None, detection_service=None):
        self.model_name = model_name
        self.generator = generator
        self.api_key = api_key or os.environ.get("MLX_VLM_SERVER_API_KEY")
        self.registry = registry
        self.image_service = image_service
        self.detection_service = detection_service

    def resolve(self, model: Optional[str]) -> tuple:
        """(generator, model_name) for a request's `model` field — the
        default generator unless the hot-swap registry knows the name
        (reference runtime.py get_cached_model)."""
        if self.registry is not None and model and model != self.model_name:
            entry = self.registry.get(model)
            if entry is not None:
                return entry.generator, model
        return self.generator, self.model_name


def make_handler(state: ServerState):
    from . import anthropic as anthropic_routes
    from . import openai as openai_routes

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        server_version = f"mlx-vlm-tpu/{__version__}"

        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s - %s", self.address_string(), fmt % args)

        # ---------------------------------------------------------- helpers
        def send_json(self, obj, status: int = 200):
            payload = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def start_sse(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()

        def send_sse(self, obj):
            self.wfile.write(f"data: {json.dumps(obj)}\n\n".encode())
            self.wfile.flush()

        def send_sse_event(self, event: str, obj):
            self.wfile.write(
                f"event: {event}\ndata: {json.dumps(obj)}\n\n".encode()
            )
            self.wfile.flush()

        def send_sse_done(self):
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()

        def _body(self) -> dict:
            length = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(length) if length else b"{}"
            return json.loads(raw or b"{}")

        def _auth_ok(self) -> bool:
            if not state.api_key:
                return True
            auth = self.headers.get("Authorization", "")
            key = auth.removeprefix("Bearer ").strip() or self.headers.get(
                "x-api-key", ""
            )
            return key == state.api_key

        # ------------------------------------------------------------ routes
        def do_DELETE(self):  # noqa: N802
            if self.path.startswith("/v1/responses/"):
                from . import responses as responses_routes

                responses_routes.delete_response(
                    self, self.path.rstrip("/").split("/")[-1]
                )
            else:
                self.send_json({"error": {"message": "not found"}}, 404)

        def do_GET(self):  # noqa: N802
            if self.path in ("/", "/chat"):
                from .webui import PAGE

                payload = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            elif self.path == "/health":
                self.send_json({"status": "ok", "model": state.model_name})
            elif self.path == "/metrics":
                from ..utils.profiling import global_phases

                snap = state.generator.metrics.snapshot()
                snap["phases"] = global_phases().snapshot()
                self.send_json(snap)
            elif self.path in ("/v1/models", "/models"):
                names = [state.model_name]
                if state.registry is not None:
                    names += [n for n in state.registry.names()
                              if n != state.model_name]
                self.send_json({
                    "object": "list",
                    "data": [{
                        "id": n,
                        "object": "model",
                        "owned_by": "mlx_vlm_tpu",
                    } for n in names],
                })
            elif self.path == "/v1/cache/stats":
                apc = getattr(state.generator, "apc", None)
                self.send_json(apc.snapshot() if apc else {"enabled": False})
            elif self.path.startswith("/v1/responses/"):
                from . import responses as responses_routes

                parts = self.path.rstrip("/").split("/")
                if parts[-1] == "input_items":
                    responses_routes.list_input_items(self, parts[-2])
                else:
                    responses_routes.retrieve_response(self, parts[-1])
            else:
                self.send_json({"error": {"message": "not found"}}, 404)

        def do_POST(self):  # noqa: N802
            if self.path in ("/v1/audio/transcriptions", "/audio/transcriptions",
                             "/v1/audio/translations", "/audio/translations"):
                from . import audio as audio_routes

                try:
                    length = int(self.headers.get("Content-Length") or 0)
                    raw = self.rfile.read(length)
                    gen, _ = state.resolve(None)
                    audio_routes.transcription_endpoint(
                        self, raw, self.headers.get("Content-Type", ""),
                        gen, translate="translations" in self.path,
                    )
                except BrokenPipeError:
                    pass
                except Exception as e:  # noqa: BLE001
                    logger.exception("audio request failed")
                    try:
                        self.send_json({"error": {"message": str(e)}}, 400)
                    except Exception:  # noqa: BLE001
                        pass
                return
            try:
                body = self._body()
            except Exception as e:  # noqa: BLE001
                self.send_json(
                    {"error": {"message": f"invalid JSON body: {e}"}}, 400
                )
                return
            try:
                if self.path == "/v1/responses":
                    from . import responses as responses_routes

                    gen, name = state.resolve(body.get("model"))
                    responses_routes.create_response(self, body, gen, name)
                elif self.path == "/v1/chat/completions":
                    gen, name = state.resolve(body.get("model"))
                    openai_routes.chat_completion(self, body, gen, name)
                elif self.path == "/v1/messages":
                    if not self._auth_ok():
                        self.send_json({"error": {"message": "unauthorized"}}, 401)
                        return
                    gen, name = state.resolve(body.get("model"))
                    anthropic_routes.messages_endpoint(self, body, gen, name)
                elif self.path == "/v1/messages/count_tokens":
                    gen, name = state.resolve(body.get("model"))
                    anthropic_routes.count_tokens(self, body, gen, name)
                elif self.path in ("/v1/audio/speech", "/audio/speech"):
                    from . import audio as audio_routes

                    gen, _ = state.resolve(body.get("model"))
                    audio_routes.speech_endpoint(self, body, gen)
                elif self.path in ("/v1/images/generations",
                                   "/images/generations",
                                   "/v1/images/edits", "/images/edits"):
                    from . import images as image_routes

                    if state.image_service is None:
                        self.send_json({"error": {"message":
                                        "no image model loaded "
                                        "(start with --image-model)"}}, 400)
                        return
                    if self.path.endswith("edits"):
                        image_routes.edits_endpoint(
                            self, body, state.image_service)
                    else:
                        image_routes.generations_endpoint(
                            self, body, state.image_service)
                elif self.path in ("/v1/detection", "/detection",
                                   "/v1/detect"):
                    from . import detection as detection_routes

                    if state.detection_service is None:
                        self.send_json({"error": {"message":
                                        "no detection model loaded "
                                        "(start with --detect-model)"}},
                                       400)
                        return
                    detection_routes.detection_endpoint(
                        self, body, state.detection_service)
                elif self.path == "/v1/cache/reset":
                    apc = getattr(state.generator, "apc", None)
                    if apc:
                        apc.reset()
                    self.send_json({"status": "ok"})
                else:
                    self.send_json({"error": {"message": "not found"}}, 404)
            except BrokenPipeError:
                pass
            except Exception as e:  # noqa: BLE001
                from pydantic import ValidationError

                status = 400 if isinstance(e, (ValidationError, ValueError)) else 500
                etype = "invalid_request_error" if status == 400 else "server_error"
                if status == 500:
                    logger.exception("request failed")
                try:
                    self.send_json(
                        {"error": {"message": str(e), "type": etype}}, status
                    )
                except Exception:  # noqa: BLE001
                    pass

    return Handler


def create_server(
    model, processor, model_name: str = "local-model",
    host: str = "0.0.0.0", port: int = 8080,
    num_slots: int = 8, capacity: int = 4096,
    api_key: Optional[str] = None,
    extra_models: Optional[dict] = None,  # name -> checkpoint path
    max_models: int = 2,
    image_service=None,  # server.images.ImageService (or None)
    detection_service=None,  # server.detection.DetectionService (or None)
    **engine_kwargs,
) -> ThreadingHTTPServer:
    if "apc" not in engine_kwargs:
        from .. import apc as apc_mod

        engine_kwargs["apc"] = apc_mod.from_env()
    if "vision_cache" not in engine_kwargs:
        from ..vision_cache import VisionFeatureCache

        engine_kwargs["vision_cache"] = VisionFeatureCache()
    generator = ResponseGenerator(
        model, processor, num_slots=num_slots, capacity=capacity, **engine_kwargs
    )
    registry = None
    if extra_models:
        from .registry import ModelRegistry

        registry = ModelRegistry(
            max_models=max_models, num_slots=num_slots, capacity=capacity
        )
        for name, path in extra_models.items():
            registry.register(name, path=path)
    state = ServerState(model_name, generator, api_key, registry=registry,
                        image_service=image_service,
                        detection_service=detection_service)
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    httpd.state = state
    return httpd


def serve(model_path: str, host="0.0.0.0", port=8080,
          draft_model_path: str | None = None,
          image_model_path: str | None = None,
          detect_model_path: str | None = None, **kwargs):
    from ..utils.loader import load

    model, processor = load(model_path)
    if draft_model_path:
        kwargs["draft_model"], _ = load(draft_model_path)
    if image_model_path:
        from .images import ImageService

        kwargs["image_service"] = ImageService.from_path(image_model_path)
    if detect_model_path:
        from .detection import DetectionService

        kwargs["detection_service"] = DetectionService(detect_model_path)
    httpd = create_server(model, processor, model_name=model_path,
                          host=host, port=port, **kwargs)
    logger.info("serving %s on %s:%d", model_path, host, port)
    try:
        httpd.serve_forever()
    finally:
        httpd.state.generator.shutdown()
        if httpd.state.registry is not None:
            httpd.state.registry.shutdown()
