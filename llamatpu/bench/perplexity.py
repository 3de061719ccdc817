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
               dtype=jnp.float32) -> dict:
    """Compute ppl of `token_ids` under the model: each position t (t >= 1)
    is scored with the logits produced after ingesting tokens[:t]."""
    cfg = model.cfg
    n = len(token_ids)
    assert n >= 2, "need at least 2 tokens"
    cache_len = cache_len or min(cfg.context_length, ((n + chunk - 1) // chunk) * chunk)
    chunk = min(chunk, cache_len)
    weights = jax.device_put(model.weights)
    cache = init_cache(cfg, 1, dtype, cache_len)

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
    i = 0
    while i < n - 1 and i < cache_len:
        toks = token_ids[i : i + chunk]
        c = len(toks)
        tgts = token_ids[i + 1 : i + 1 + c]
        valid = [True] * len(tgts) + [False] * (c - len(tgts))
        tgts = tgts + [0] * (c - len(tgts))
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

    ppl = math.exp(total_nll / max(total_cnt, 1))
    return {"ppl": ppl, "nll": total_nll, "tokens": total_cnt}


def perplexity_of_text(model: LoadedModel, text: str, **kw) -> dict:
    ids = model.tokenizer.encode(text, allowed_special="all")
    bot = model.chat_format.begin_of_text() if model.chat_format else -1
    if bot >= 0:
        ids = [bot] + ids
    return perplexity(model, ids, **kw)
