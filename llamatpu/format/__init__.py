from llamatpu.format.chat_format import (
    ChatFormat, Message, Role, build_chat_format,
)
from llamatpu.format.tool_parser import (
    ToolCall, parse_tool_call_response, parse_all_tool_calls, strip_markdown_fences,
)

__all__ = [
    "ChatFormat", "Message", "Role", "build_chat_format",
    "ToolCall", "parse_tool_call_response", "parse_all_tool_calls", "strip_markdown_fences",
]
