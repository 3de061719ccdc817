"""Chat-format tests: Llama-3 header structure, stop tokens, prompt assembly,
tool-calling encodings and thinking control."""
import tiny_models
from llamatpu.format import Message, build_chat_format
from llamatpu.format.tool_parser import ToolCall
from llamatpu.gguf import GGUFReader
from llamatpu.models.config import Family
from llamatpu.tokenizer.builders import build_tokenizer


def make_llama_format(tmp_path):
    tiny_models.build_tiny_gguf(tmp_path / "m.gguf", family="llama", with_tokenizer=True)
    with GGUFReader(tmp_path / "m.gguf") as r:
        tok = build_tokenizer(Family.LLAMA_3, r.metadata)
        return build_chat_format(Family.LLAMA_3, tok, r.metadata), tok


def test_llama_message_structure(tmp_path):
    fmt, tok = make_llama_format(tmp_path)
    ids = fmt.encode_message(Message("user", "hello"))
    sp = tok.special_tokens
    assert ids[0] == sp["<|start_header_id|>"]
    assert ids[-1] == sp["<|eot_id|>"]
    assert sp["<|end_header_id|>"] in ids
    assert fmt.stop_tokens() == {sp["<|eot_id|>"], sp["<|end_of_text|>"]}


def test_llama_prompt_assembly(tmp_path):
    fmt, tok = make_llama_format(tmp_path)
    ids = fmt.build_prompt([Message("user", "hello")], system_prompt="be brief")
    sp = tok.special_tokens
    assert ids[0] == sp["<|begin_of_text|>"]
    # ends with assistant header (role "assistant" encoded + trailing newline)
    assert ids.count(sp["<|start_header_id|>"]) == 3  # system, user, assistant
    assert ids[-1] != sp["<|eot_id|>"]


def test_llama_tool_encodings(tmp_path):
    fmt, tok = make_llama_format(tmp_path)
    assert fmt.supports_tool_calling() and fmt.injects_tools_in_user_message()
    assert fmt.tool_system_message_prefix().startswith("Environment: ipython")
    assert '"name"' in fmt.tool_first_user_message_prefix("[]")
    turn = fmt.encode_tool_call_assistant_turn([ToolCall("f", '{"x": 1}')])
    assert turn[-1] in (tok.special_tokens.get("<|eom_id|>"), tok.special_tokens["<|eot_id|>"])
    res = fmt.encode_tool_result_turn("id", "f", "42")
    assert res[0] == tok.special_tokens["<|start_header_id|>"]
    assert res[-1] == tok.special_tokens["<|eot_id|>"]


def test_default_sampling_params(tmp_path):
    fmt, _ = make_llama_format(tmp_path)
    assert fmt.default_temperature() == 0.3
    assert fmt.default_top_p() == 0.95
