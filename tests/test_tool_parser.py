"""Tool-call parser tests — port of the reference's only unit-test class
(ToolCallParserUtilsTest.java:21-60) plus the same edge cases."""
from llamatpu.format.tool_parser import (
    parse_all_tool_calls, parse_tool_call_response, strip_markdown_fences,
)


def test_qwen3_tool_call_arguments():
    tc = parse_tool_call_response(
        '<tool_call>\n{"name": "get_weather", "arguments": {"city": "Chania"}}\n</tool_call>')
    assert tc and tc.name == "get_weather" and tc.arguments_json == '{"city": "Chania"}'


def test_llama31_python_tag_parameters_key():
    tc = parse_tool_call_response(
        '<|python_tag|>{"name": "get_weather", "parameters": {"city": "Boston"}}')
    assert tc and tc.name == "get_weather" and tc.arguments_json == '{"city": "Boston"}'


def test_function_key_used_as_name_fallback():
    tc = parse_tool_call_response(
        '<tool_call>{"function": "list_dir", "arguments": {"path": "/tmp"}}</tool_call>')
    assert tc and tc.name == "list_dir"


def test_missing_arguments_defaults_to_empty_object():
    tc = parse_tool_call_response('<tool_call>{"name": "now"}</tool_call>')
    assert tc and tc.name == "now" and tc.arguments_json == "{}"


def test_unclosed_tool_call_still_parsed():
    tc = parse_tool_call_response('<tool_call>{"name": "ping", "arguments": {"host": "a"}}')
    assert tc and tc.name == "ping" and tc.arguments_json == '{"host": "a"}'


def test_plain_text_is_not_a_tool_call():
    assert parse_tool_call_response("The weather in Chania is sunny.") is None


def test_braces_in_string_value_kept_intact():
    args = '{"code": "public class A { void m() { return; } }"}'
    tc = parse_tool_call_response(
        '<tool_call>{"name": "write_file", "arguments": ' + args + "}</tool_call>")
    assert tc and tc.name == "write_file" and tc.arguments_json == args


def test_escaped_quotes_and_braces_kept_intact():
    args = '{"snippet": "if (s.equals(\\"}\\")) { x++; }"}'
    tc = parse_tool_call_response(
        '<tool_call>{"name": "run", "arguments": ' + args + "}</tool_call>")
    assert tc and tc.arguments_json == args


def test_nested_objects_and_arrays_kept_intact():
    args = '{"items": [{"a": 1}, {"b": 2}], "meta": {"n": 3}}'
    tc = parse_tool_call_response(
        '<tool_call>{"name": "batch", "arguments": ' + args + "}</tool_call>")
    assert tc and tc.arguments_json == args


def test_raw_json_fallback_no_tags():
    tc = parse_tool_call_response('{"name": "echo", "arguments": {"msg": "hi"}}')
    assert tc and tc.name == "echo"


def test_markdown_fenced_json_fallback():
    tc = parse_tool_call_response('```json\n{"name": "echo", "arguments": {"msg": "hi"}}\n```')
    assert tc and tc.name == "echo" and tc.arguments_json == '{"msg": "hi"}'


def test_strip_markdown_fences():
    assert strip_markdown_fences("```\nbody\n```") == "body"
    assert strip_markdown_fences("plain") == "plain"


def test_batch_multiple_tool_call_blocks():
    calls = parse_all_tool_calls(
        '<tool_call>{"name": "a", "arguments": {"x": 1}}</tool_call>'
        '<tool_call>{"name": "b", "arguments": {"y": 2}}</tool_call>')
    assert [c.name for c in calls] == ["a", "b"]
    assert calls[0].arguments_json == '{"x": 1}' and calls[1].arguments_json == '{"y": 2}'


def test_batch_unclosed_final_block():
    calls = parse_all_tool_calls(
        '<tool_call>{"name": "a", "arguments": {"x": 1}}</tool_call>'
        '<tool_call>{"name": "b", "arguments": {"y": 2}}')
    assert [c.name for c in calls] == ["a", "b"]


def test_python_tag_is_single_call():
    calls = parse_all_tool_calls('<|python_tag|>{"name": "a", "parameters": {"x": 1}}')
    assert len(calls) == 1 and calls[0].name == "a"
