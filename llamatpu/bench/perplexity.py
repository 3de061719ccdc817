"""Perplexity evaluation harness.

The reference has no in-repo ppl tool (SURVEY.md §4); BASELINE.json makes ppl
parity a first-class target (Q8_0 within ~0.01 of FP16; Q4_0 within GGUF's
stated delta), so this harness is new scope: chunked causal evaluation through
the same jitted forward used for inference, accumulating token NLL on device.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.models.loader import LoadedModel
from llamatpu.models.transformer import forward_tokens, init_cache


def perplexity(model: LoadedModel, token_ids: list[int], chunk: int = 128,
               impl: str = "xla", cache_len: int | None = None,
               dtype=jnp.float32, stride: int | None = None) -> dict:
    """Compute ppl of `token_ids` under the model: each position t (t >= 1)
    is scored with the logits produced after ingesting its predecessors.

    Texts longer than the cache evaluate with SLIDING WINDOWS: each window
    of `cache_len` tokens starts `stride` (default cache_len//2) after the
    previous one from a FRESH cache, re-ingests the overlap as unscored
    context, and scores only the new tokens — so every scored token past the
    first window sees >= cache_len - stride tokens of context. (Round 1
    silently truncated to the first cache_len tokens and reported the ppl of
    a prefix.) Equivalent to the llama.cpp/HF strided-perplexity convention."""
    cfg = model.cfg
    n = len(token_ids)
    assert n >= 2, "need at least 2 tokens"
    cache_len = cache_len or min(cfg.context_length, ((n + chunk - 1) // chunk) * chunk)
    chunk = min(chunk, cache_len)
    stride = stride or max(chunk, cache_len // 2)
    stride = -(-stride // chunk) * chunk  # chunk-aligned window starts
    assert 0 < stride <= cache_len
    weights = jax.device_put(model.weights)

    @partial(jax.jit, donate_argnums=(3,))
    def chunk_nll(weights, toks, targets, cache, pos, valid):
        """toks/targets: [1, C]; valid: [C] bool (mask padding + no-target)."""
        logits, cache = forward_tokens(cfg, weights, toks, cache, pos, impl=impl)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [1, C, V]
        tgt_lp = jnp.take_along_axis(logp[0], targets[0][:, None], axis=-1)[:, 0]
        tgt_lp = jnp.where(valid, tgt_lp, 0.0)
        return -jnp.sum(tgt_lp), jnp.sum(valid), cache

    total_nll = 0.0
    total_cnt = 0
    start = 0  # window start in the text
    while start == 0 or start + (cache_len - stride) < n - 1:
        window = token_ids[start : start + cache_len]
        score_from = 0 if start == 0 else cache_len - stride  # overlap = context only
        cache = init_cache(cfg, 1, dtype, cache_len)
        i = 0
        while i < len(window) - (1 if start + len(window) >= n else 0):
            toks = window[i : i + chunk]
            c = len(toks)
            # targets may extend one past the window's end (text permitting)
            tail = token_ids[start + i + 1 : start + i + 1 + c]
            valid = [j + i >= score_from for j in range(len(tail))] + [False] * (c - len(tail))
            tgts = tail + [0] * (c - len(tail))
            if c < chunk:
                toks = toks + [0] * (chunk - c)
                tgts = tgts + [0] * (chunk - c)
                valid = valid + [False] * (chunk - c)
            nll, cnt, cache = chunk_nll(
                weights, np.asarray([toks], np.int32), np.asarray([tgts], np.int32),
                cache, np.int32(i), np.asarray(valid))
            total_nll += float(nll)
            total_cnt += int(cnt)
            i += c
        if start + cache_len >= n:
            break
        start += stride

    ppl = math.exp(total_nll / max(total_cnt, 1))
    return {"ppl": ppl, "nll": total_nll, "tokens": total_cnt}


def perplexity_of_text(model: LoadedModel, text: str, **kw) -> dict:
    ids = model.tokenizer.encode(text, allowed_special="all")
    bot = model.chat_format.begin_of_text() if model.chat_format else -1
    if bot >= 0:
        ids = [bot] + ids
    return perplexity(model, ids, **kw)
