"""Inference service: thread-safe single-engine request executor.

Parity with the reference's InferenceService (server/InferenceService.java:
24-108): one State + one plan built once, requests strictly serialized (a lock
— the reference synchronizes generate()), per-request sampler params and seed,
KV overwritten from pos 0 each request. Continuous batching across a BatchEngine
is the next-round upgrade (SURVEY.md §7.1 north star).
"""
from __future__ import annotations

import threading
from dataclasses import dataclass, field

from llamatpu.format.chat_format import Message
from llamatpu.models.loader import LoadedModel
from llamatpu.runtime.engine import Engine
from llamatpu.tokenizer.stream import StreamDecoder


@dataclass
class Request:
    messages: list[Message]
    max_tokens: int = 256
    temperature: float = 0.0
    top_p: float = 0.95
    seed: int = 1234
    raw_prompt: bool = False  # /v1/completions: no chat template


@dataclass
class Result:
    text: str
    prompt_tokens: int
    completion_tokens: int
    finish_reason: str  # "stop" | "length"


def encode_request(model: LoadedModel, req: Request) -> list[int]:
    """Build the prompt token ids for a request (chat template or raw)."""
    fmt = model.chat_format
    tok = model.tokenizer
    if req.raw_prompt:
        prompt_text = "".join(m.content for m in req.messages)
        tokens = []
        bot = fmt.begin_of_text()
        if fmt.add_begin_of_text and bot >= 0:
            tokens.append(bot)
        tokens += tok.encode(prompt_text, allowed_special="all")
        return tokens
    system = None
    msgs = []
    for m in req.messages:
        if m.role == "system":
            system = m.content
        else:
            msgs.append(m)
    return fmt.build_prompt(msgs, system_prompt=system)


class InferenceService:
    def __init__(self, model: LoadedModel, engine: Engine):
        self.model = model
        self.engine = engine
        self._lock = threading.Lock()

    def generate(self, req: Request, on_piece=None) -> Result:
        with self._lock:
            fmt = self.model.chat_format
            tok = self.model.tokenizer
            tokens = encode_request(self.model, req)
            engine = self.engine
            engine.reset(seed=req.seed)
            budget = min(req.max_tokens, engine.cache_len - len(tokens) - 1)
            if budget <= 0:
                return Result("", len(tokens), 0, "length")

            sd = StreamDecoder(tok)
            pieces: list[str] = []

            def on_token(t):
                text = sd.push(t)
                if text:
                    pieces.append(text)
                    if on_piece:
                        on_piece(text)

            res = engine.generate(
                tokens, budget, stop_tokens=fmt.stop_tokens(), on_token=on_token,
                temperature=req.temperature, top_p=req.top_p)
            tail = sd.flush()
            if tail:
                pieces.append(tail)
                if on_piece:
                    on_piece(tail)
            finish = "stop" if res.stop_reason == "stop_token" else "length"
            n_completion = len(res.tokens)
            return Result("".join(pieces), len(tokens), n_completion, finish)


class BatchedInferenceService:
    """Continuous-batching service: concurrent requests share a BatchEngine via
    the ContinuousBatcher scheduler — requests are NOT serialized (north-star
    upgrade over the reference's synchronized InferenceService)."""

    def __init__(self, model: LoadedModel, batch_engine):
        from llamatpu.runtime.scheduler import ContinuousBatcher

        self.model = model
        self.batcher = ContinuousBatcher(batch_engine, model.chat_format.stop_tokens())
        self.engine = batch_engine

    def generate(self, req: Request, on_piece=None) -> Result:
        from llamatpu.runtime.scheduler import BatchRequest

        tokens = encode_request(self.model, req)
        budget = min(req.max_tokens, self.engine.cache_len - len(tokens) - 2)
        if budget <= 0:
            return Result("", len(tokens), 0, "length")
        stream = self.batcher.submit(BatchRequest(
            prompt_tokens=tokens, max_new_tokens=budget,
            temperature=req.temperature, top_p=req.top_p))
        sd = StreamDecoder(self.model.tokenizer)
        pieces: list[str] = []
        n = 0
        for t in stream:
            n += 1
            text = sd.push(t)
            if text:
                pieces.append(text)
                if on_piece:
                    on_piece(text)
        tail = sd.flush()
        if tail:
            pieces.append(tail)
            if on_piece:
                on_piece(tail)
        finish = stream.finish_reason or "length"
        return Result("".join(pieces), len(tokens), n, finish)
