"""Tool-calling request encoding through the service layer: tool-definition
injection (Llama: first-user-message; Qwen: system suffix), assistant
tool-call turn and tool-result turn re-encoding, tool-aware stops."""
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.models import loader as mloader
from llamatpu.server.service import Request, encode_request, stop_tokens_for


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("tools") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", with_tokenizer=True, seed=23)
    return mloader.load_model(str(path), param_dtype=jnp.float32)


TOOLS = '[{"type": "function", "function": {"name": "get_weather"}}]'


def test_tools_injected_into_first_user_message(model):
    req = Request(messages=[
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "weather?"},
    ], tools_json=TOOLS)
    with_tools = encode_request(model, req)
    without = encode_request(model, Request(messages=req.messages))
    assert len(with_tools) > len(without)
    # llama injects "Environment: ipython" into system + instructions into user
    text = model.tokenizer.decode([t for t in with_tools
                                   if model.tokenizer.should_display_token(t)])
    assert "Environment: ipython" in text
    assert "get_weather" in text


def test_tool_turns_reencoded(model):
    req = Request(messages=[
        {"role": "user", "content": "weather?"},
        {"role": "assistant", "tool_calls": [
            {"id": "call_0", "type": "function",
             "function": {"name": "get_weather", "arguments": '{"city": "Paris"}'}}]},
        {"role": "tool", "tool_call_id": "call_0", "name": "get_weather",
         "content": "sunny"},
    ], tools_json=TOOLS)
    ids = encode_request(model, req)
    text = model.tokenizer.decode(ids)
    assert "get_weather" in text and "sunny" in text and "ipython" in text


def test_tool_aware_stops_superset(model):
    base = stop_tokens_for(model, Request(messages=[]))
    with_tools = stop_tokens_for(model, Request(messages=[], tools_json=TOOLS))
    assert base <= with_tools
