import base64
import io
import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from mlx_vlm_tpu.server.app import create_server
    from mlx_vlm_tpu.utils.loader import load
    from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

    d = tmp_path_factory.mktemp("ckpt")
    build_tiny_checkpoint(str(d))
    model, processor = load(str(d), dtype=jnp.float32)
    port = _free_port()
    httpd = create_server(
        model, processor, model_name="tiny-qwen2-vl",
        host="127.0.0.1", port=port, num_slots=2, capacity=256,
        block_size=2, token_queue_timeout=120.0,
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    httpd.state.generator.shutdown()


def _post(url, path, body, timeout=120):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _post_stream(url, path, body, timeout=120):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                payload = line[6:]
                if payload == "[DONE]":
                    events.append("[DONE]")
                else:
                    events.append(json.loads(payload))
    return events


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def _png_b64():
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(0).random((56, 56, 3)) * 255).astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestBasicEndpoints:
    def test_web_ui(self, server):
        with urllib.request.urlopen(server + "/", timeout=30) as r:
            body = r.read().decode()
        assert r.headers["Content-Type"].startswith("text/html")
        assert "/v1/chat/completions" in body

    def test_health(self, server):
        status, body = _get(server, "/health")
        assert status == 200 and body["status"] == "ok"

    def test_models(self, server):
        status, body = _get(server, "/v1/models")
        assert body["data"][0]["id"] == "tiny-qwen2-vl"

    def test_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server, "/nope")
        assert e.value.code == 404


class TestOpenAI:
    def test_chat_completion(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Hello there friend"}],
            "max_tokens": 6,
        })
        assert status == 200
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"
        assert body["usage"]["completion_tokens"] >= 1
        assert body["choices"][0]["finish_reason"] in ("stop", "length")

    def test_chat_response_format_json_object(self, server):
        """response_format json_object: output must be one valid JSON doc
        (reference structured.py automaton riding the server)."""
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Emit some JSON"}],
            "max_tokens": 96,
            "response_format": {"type": "json_object"},
        })
        assert status == 200
        text = body["choices"][0]["message"]["content"]
        json.loads(text)  # must parse

    def test_chat_response_format_json_schema(self, server):
        """json_schema with required/enum must be satisfied end to end."""
        schema = {
            "type": "object",
            "properties": {
                "kind": {"type": "string", "enum": ["cat", "dog"]},
            },
            "required": ["kind"],
            # bounded document space so a random tiny model terminates
            "additionalProperties": False,
        }
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Classify the animal"}],
            "max_tokens": 96,
            "response_format": {"type": "json_schema",
                                "json_schema": {"schema": schema}},
        })
        assert status == 200
        doc = json.loads(body["choices"][0]["message"]["content"])
        assert doc.get("kind") in ("cat", "dog")

    def test_chat_completion_stream(self, server):
        events = _post_stream(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "Stream please"}],
            "max_tokens": 5,
            "stream": True,
        })
        assert events[-1] == "[DONE]"
        chunks = [e for e in events if isinstance(e, dict)]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
        assert "usage" in chunks[-1]

    def test_chat_with_image(self, server):
        b64 = _png_b64()
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "text", "text": "What is this?"},
                    {"type": "image_url",
                     "image_url": {"url": f"data:image/png;base64,{b64}"}},
                ],
            }],
            "max_tokens": 4,
        })
        assert status == 200
        assert body["usage"]["prompt_tokens"] > 10  # image tokens included

    def test_concurrent_requests(self, server):
        results = {}

        def hit(i):
            results[i] = _post(server, "/v1/chat/completions", {
                "messages": [{"role": "user", "content": f"request {i}"}],
                "max_tokens": 4,
            })

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 4
        for status, body in results.values():
            assert status == 200 and body["choices"][0]["message"]["content"] is not None

    def test_prompt_too_long(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/v1/chat/completions", {
                "messages": [{"role": "user", "content": "word " * 600}],
                "max_tokens": 4,
            })
        assert e.value.code == 500
        body = json.loads(e.value.read())
        assert "context budget" in body["error"]["message"]

    def test_logprobs(self, server):
        status, body = _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "logprobs please"}],
            "max_tokens": 4,
            "logprobs": True,
        })
        lps = body["choices"][0]["logprobs"]["content"]
        assert len(lps) >= 1
        assert all(l["logprob"] <= 0.0 for l in lps)

    def test_bad_json(self, server):
        req = urllib.request.Request(
            server + "/v1/chat/completions", data=b"{not json",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400


class TestAnthropic:
    def test_messages(self, server):
        status, body = _post(server, "/v1/messages", {
            "model": "x", "max_tokens": 5,
            "system": "You are terse.",
            "messages": [{"role": "user", "content": "Hi"}],
        })
        assert status == 200
        assert body["type"] == "message"
        assert body["content"][0]["type"] == "text"
        assert body["stop_reason"] in ("end_turn", "max_tokens")

    def test_messages_stream_events(self, server):
        req = urllib.request.Request(
            server + "/v1/messages",
            data=json.dumps({
                "max_tokens": 4, "stream": True,
                "messages": [{"role": "user", "content": "Hello there"}],
            }).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        names = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for line in r:
                line = line.decode().strip()
                if line.startswith("event: "):
                    names.append(line[7:])
        assert names[0] == "message_start"
        assert "content_block_delta" in names
        assert names[-1] == "message_stop"

    def test_messages_with_image(self, server):
        status, body = _post(server, "/v1/messages", {
            "max_tokens": 4,
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "image",
                     "source": {"type": "base64", "media_type": "image/png",
                                "data": _png_b64()}},
                    {"type": "text", "text": "Describe"},
                ],
            }],
        })
        assert status == 200 and body["usage"]["input_tokens"] > 10

    def test_count_tokens(self, server):
        status, body = _post(server, "/v1/messages/count_tokens", {
            "messages": [{"role": "user", "content": "count me"}],
            "max_tokens": 1,
        })
        assert status == 200 and body["input_tokens"] > 0


class TestResponsesAPI:
    def test_create_and_retrieve(self, server):
        status, body = _post(server, "/v1/responses", {
            "input": "Say something",
            "max_output_tokens": 5,
        })
        assert status == 200 and body["object"] == "response"
        assert body["status"] == "completed"
        assert body["output"][0]["content"][0]["type"] == "output_text"
        rid = body["id"]
        status2, body2 = _get(server, f"/v1/responses/{rid}")
        assert body2["id"] == rid

    def test_input_items_and_chaining(self, server):
        _, first = _post(server, "/v1/responses", {
            "input": "First turn", "max_output_tokens": 4,
        })
        status, items = _get(server, f"/v1/responses/{first['id']}/input_items")
        assert items["data"][0]["content"] == "First turn"
        status, second = _post(server, "/v1/responses", {
            "input": "Second turn",
            "previous_response_id": first["id"],
            "max_output_tokens": 4,
        })
        assert status == 200
        assert second["previous_response_id"] == first["id"]

    def test_stream_events(self, server):
        req = urllib.request.Request(
            server + "/v1/responses",
            data=json.dumps({"input": "stream", "max_output_tokens": 4,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        names = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for line in r:
                line = line.decode().strip()
                if line.startswith("event: "):
                    names.append(line[7:])
        assert names[0] == "response.created"
        assert names[-1] == "response.completed"

    def test_retrieve_missing(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server, "/v1/responses/resp_nope")
        assert e.value.code == 404


class TestMetrics:
    def test_metrics_populated(self, server):
        _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "for metrics"}],
            "max_tokens": 3,
        })
        status, body = _get(server, "/metrics")
        assert body["requests_total"] >= 1
        assert body["total_generation_tokens"] >= 1


class TestSpeculativeServing:
    """--draft-model serving: greedy requests run draft/verify rounds
    (reference server _run_speculative, generation.py:1902)."""

    @pytest.fixture(scope="class")
    def spec_servers(self, tmp_path_factory):
        from mlx_vlm_tpu.server.app import create_server
        from mlx_vlm_tpu.utils.loader import load
        from mlx_vlm_tpu.utils.testing import build_tiny_checkpoint

        d = tmp_path_factory.mktemp("spec_ckpt")
        build_tiny_checkpoint(str(d))
        model, processor = load(str(d), dtype=jnp.float32)
        servers = []
        for draft in (None, model):  # draft == target -> full acceptance
            port = _free_port()
            httpd = create_server(
                model, processor, model_name="tiny-qwen2-vl",
                host="127.0.0.1", port=port, num_slots=2, capacity=256,
                block_size=2, token_queue_timeout=120.0,
                draft_model=draft, num_draft=3,
            )
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            servers.append((httpd, f"http://127.0.0.1:{port}"))
        yield servers[0][1], servers[1][1]
        for httpd, _ in servers:
            httpd.shutdown()
            httpd.state.generator.shutdown()

    def test_greedy_output_identical_and_accepted(self, spec_servers):
        plain_url, spec_url = spec_servers
        body = {
            "messages": [{"role": "user", "content": "speculate this"}],
            "max_tokens": 8, "temperature": 0.0,
        }
        _, plain = _post(plain_url, "/v1/chat/completions", body)
        _, spec = _post(spec_url, "/v1/chat/completions", body)
        assert spec["choices"][0]["message"]["content"] == \
            plain["choices"][0]["message"]["content"]
        _, metrics = _get(spec_url, "/metrics")
        entry = metrics["recent"][-1]
        assert "speculative" in entry
        # drafter == target: every drafted token is accepted
        assert entry["speculative"]["accepted"] >= entry["speculative"]["rounds"]
        assert entry["speculative"]["acceptance_rate"] == 1.0

    def test_sampled_request_uses_batch_path(self, spec_servers):
        _, spec_url = spec_servers
        _, resp = _post(spec_url, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "sampled"}],
            "max_tokens": 4, "temperature": 0.7,
        })
        assert resp["choices"][0]["finish_reason"] in ("stop", "length")

    def test_concurrent_speculative_requests(self, spec_servers):
        """2+ concurrent speculative requests advance through SHARED
        batched rounds (reference run_speculative_server_rounds,
        speculative/utils.py:118) — speculation must not serialize the
        batch.  Outputs stay identical to the plain server's."""
        plain_url, spec_url = spec_servers
        bodies = [{
            "messages": [{"role": "user", "content": f"concurrent {i}"}],
            "max_tokens": 8, "temperature": 0.0,
        } for i in range(2)]
        expected = [
            _post(plain_url, "/v1/chat/completions", b)[1] for b in bodies
        ]

        results = [None, None]

        def go(i):
            results[i] = _post(spec_url, "/v1/chat/completions", bodies[i])[1]

        threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(2):
            assert results[i] is not None, "request hung"
            assert (
                results[i]["choices"][0]["message"]["content"]
                == expected[i]["choices"][0]["message"]["content"]
            )
        _, metrics = _get(spec_url, "/metrics")
        spec_entries = [r for r in metrics["recent"] if "speculative" in r]
        assert len(spec_entries) >= 2
        assert all(e["speculative"]["accepted"] >= 1 for e in spec_entries)
