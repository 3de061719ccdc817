"""Strict OpenAI API schema conformance — the checks the official `openai`
Python client's pydantic models would enforce (the package itself is
unavailable in this zero-egress image; the reference's CI drives a real
langchain4j client against its server, build-and-run.yml:524-667 — this suite
is the hermetic analog, pinning the exact field shapes/types client libraries
parse so schema drift fails CI instead of a downstream app)."""
import json
import threading
import urllib.request

import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.models import loader as mloader
from llamatpu.runtime.engine import Engine
from llamatpu.server.openai_server import make_server
from llamatpu.server.service import InferenceService


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = tmp_path_factory.mktemp("srv") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", with_tokenizer=True, seed=5)
    model = mloader.load_model(str(path), param_dtype=jnp.float32)
    engine = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                    decode_window=4)
    service = InferenceService(model, engine)
    srv = make_server(service, "127.0.0.1", 0, model_id="tiny-test")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, body, raw=False):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            data = r.read()
            return r.status, data if raw else json.loads(data)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_chat_completion_full_schema(server):
    status, b = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 6, "temperature": 0})
    assert status == 200
    # pydantic ChatCompletion: every field the client model requires
    assert isinstance(b["id"], str) and b["id"].startswith("chatcmpl-")
    assert b["object"] == "chat.completion"
    assert isinstance(b["created"], int) and b["created"] > 1600000000
    assert isinstance(b["model"], str)
    assert isinstance(b["choices"], list) and len(b["choices"]) == 1
    c = b["choices"][0]
    assert c["index"] == 0
    assert c["finish_reason"] in ("stop", "length", "tool_calls",
                                  "content_filter")
    m = c["message"]
    assert m["role"] == "assistant"
    assert m["content"] is None or isinstance(m["content"], str)
    u = b["usage"]
    for k in ("prompt_tokens", "completion_tokens", "total_tokens"):
        assert isinstance(u[k], int) and u[k] >= 0
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]


def test_sse_framing_strict(server):
    """Every event must be a `data: {json}` line followed by a BLANK line
    (the SSE spec framing httpx/openai's stream parser relies on), ending
    with `data: [DONE]`; ids/models/created consistent across chunks;
    finish_reason null until the final data chunk."""
    status, raw = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 6, "temperature": 0, "stream": True}, raw=True)
    assert status == 200
    text = raw.decode()
    events = [e for e in text.split("\n\n") if e.strip()]
    assert events[-1].strip() == "data: [DONE]"
    chunks = []
    for e in events[:-1]:
        lines = e.strip().splitlines()
        assert len(lines) == 1 and lines[0].startswith("data: "), lines
        chunks.append(json.loads(lines[0][6:]))
    ids = {c["id"] for c in chunks}
    assert len(ids) == 1 and next(iter(ids)).startswith("chatcmpl-")
    assert len({c["created"] for c in chunks}) == 1
    for c in chunks:
        assert c["object"] == "chat.completion.chunk"
        assert isinstance(c["model"], str)
        ch = c["choices"][0]
        assert ch["index"] == 0
        assert set(ch["delta"].keys()) <= {"role", "content", "tool_calls"}
    assert all(c["choices"][0]["finish_reason"] is None for c in chunks[:-1])
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length",
                                                         "tool_calls")


def test_tool_call_arguments_are_json_string(server):
    """The classic drift a real client catches: `function.arguments` must be
    a JSON-encoded STRING, not an object; tool_calls ids must be strings
    with the call_ prefix; type must be the literal 'function'."""
    status, b = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "what is the weather"}],
        "max_tokens": 48, "temperature": 0,
        "tools": [{"type": "function", "function": {
            "name": "get_weather",
            "description": "Get the weather",
            "parameters": {"type": "object", "properties": {
                "city": {"type": "string"}}}}}]})
    assert status == 200
    m = b["choices"][0]["message"]
    # a tiny random model rarely emits a parseable tool call; the schema
    # contract still holds: tool_calls is absent/None OR well-formed
    tcs = m.get("tool_calls")
    if tcs:
        for tc in tcs:
            assert isinstance(tc["id"], str) and tc["id"].startswith("call_")
            assert tc["type"] == "function"
            assert isinstance(tc["function"]["name"], str)
            args = tc["function"]["arguments"]
            assert isinstance(args, str)
            json.loads(args)  # must itself parse as JSON
        assert b["choices"][0]["finish_reason"] == "tool_calls"


def test_tool_message_roundtrip_accepted(server):
    """A full tool-use conversation (assistant tool_calls turn + tool result
    turn) must be accepted by the re-encoder — the client sends exactly this
    shape back."""
    status, b = _post(server + "/v1/chat/completions", {
        "messages": [
            {"role": "user", "content": "weather?"},
            {"role": "assistant", "content": None, "tool_calls": [
                {"id": "call_abc123", "type": "function", "function": {
                    "name": "get_weather",
                    "arguments": "{\"city\": \"Paris\"}"}}]},
            {"role": "tool", "tool_call_id": "call_abc123",
             "content": "{\"temp\": 21}"},
        ],
        "max_tokens": 6, "temperature": 0})
    assert status == 200
    assert b["choices"][0]["message"]["role"] == "assistant"


def test_streaming_usage_option(server):
    """stream_options.include_usage: usage chunk arrives as the LAST data
    chunk with an EMPTY choices list (exact OpenAI semantics)."""
    status, raw = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4, "temperature": 0, "stream": True,
        "stream_options": {"include_usage": True}}, raw=True)
    assert status == 200
    chunks = [json.loads(l[6:]) for l in raw.decode().splitlines()
              if l.startswith("data: ") and l != "data: [DONE]"]
    assert chunks[-1]["choices"] == []
    u = chunks[-1]["usage"]
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert all(c.get("usage") is None for c in chunks[:-1])


def test_completions_full_schema(server):
    status, b = _post(server + "/v1/completions", {
        "prompt": "hello", "max_tokens": 4, "temperature": 0})
    assert status == 200
    assert b["id"].startswith("cmpl-")
    assert b["object"] == "text_completion"
    assert isinstance(b["created"], int)
    c = b["choices"][0]
    assert isinstance(c["text"], str)
    assert c["index"] == 0
    assert c["finish_reason"] in ("stop", "length")
    assert b["usage"]["total_tokens"] > 0


def test_error_body_schema(server):
    """Client libraries raise typed errors from this exact shape."""
    status, b = _post(server + "/v1/chat/completions", {"messages": []})
    assert status == 400
    err = b["error"]
    assert isinstance(err["message"], str)
    assert isinstance(err.get("type"), str)
    status, b = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "x"}],
        "max_tokens": -5})
    assert status == 400 and "error" in b
