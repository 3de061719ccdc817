"""Server black-box smoke tests over real HTTP — parity with the reference's
scripts/server-smoke-test.sh (health/models/chat/completions/SSE checks)."""
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
    engine = Engine(model, cache_dtype=jnp.float32, aot_compile=False, decode_window=4)
    service = InferenceService(model, engine)
    srv = make_server(service, "127.0.0.1", 0, model_id="tiny-test")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url, body, raw=False):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            data = r.read()
            return r.status, data if raw else json.loads(data)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    status, body = _get(server + "/health")
    assert status == 200 and body == {"status": "ok"}


def test_models(server):
    status, body = _get(server + "/v1/models")
    assert status == 200
    assert body["data"][0]["id"] == "tiny-test"


def test_chat_completion(server):
    status, body = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 8, "temperature": 0})
    assert status == 200
    assert body["object"] == "chat.completion"
    choice = body["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert choice["finish_reason"] in ("stop", "length")
    u = body["usage"]
    assert u["prompt_tokens"] > 0 and u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]


def test_chat_determinism(server):
    body = {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 6,
            "temperature": 0, "seed": 7}
    _, a = _post(server + "/v1/chat/completions", body)
    _, b = _post(server + "/v1/chat/completions", body)
    assert a["choices"][0]["message"]["content"] == b["choices"][0]["message"]["content"]


def test_text_completion(server):
    status, body = _post(server + "/v1/completions", {"prompt": "hello", "max_tokens": 4})
    assert status == 200
    assert body["object"] == "text_completion"
    assert "text" in body["choices"][0]


def test_streaming_sse(server):
    status, raw = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 6, "temperature": 0, "stream": True}, raw=True)
    assert status == 200
    text = raw.decode()
    chunks = [json.loads(line[6:]) for line in text.splitlines()
              if line.startswith("data: ") and line != "data: [DONE]"]
    assert text.rstrip().endswith("data: [DONE]")
    # first chunk: role delta; last data chunk: finish_reason set
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)


def test_bad_requests(server):
    status, body = _post(server + "/v1/chat/completions", {"messages": []})
    assert status == 400
    status, body = _post(server + "/v1/completions", {"prompt": ""})
    assert status == 400
