"""Perplexity harness: chunked evaluation must equal per-token evaluation, and
Q8_0 ppl must track F32 ppl closely on the same checkpoint."""
import math

import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.bench.perplexity import perplexity
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader


def _load(tmp_path, quant, mode, seed=21):
    path = tmp_path / f"m_{int(quant)}.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=quant, seed=seed)
    return mloader.load_model(str(path), mode=mode, param_dtype=jnp.float32,
                              load_tokenizer=False)


def per_token_ppl(model, ids):
    """Oracle: one-token-at-a-time forward, host log-softmax."""
    import jax

    from llamatpu.models.transformer import forward_tokens, init_cache

    weights = jax.device_put(model.weights)
    cache = init_cache(model.cfg, 1, jnp.float32, 64)
    nll, cnt = 0.0, 0
    for pos in range(len(ids) - 1):
        logits, cache = forward_tokens(model.cfg, weights,
                                       jnp.asarray([[ids[pos]]], jnp.int32),
                                       cache, pos, last_logit_only=True)
        lp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32)))
        nll -= lp[ids[pos + 1]]
        cnt += 1
    return math.exp(nll / cnt)


def test_chunked_matches_per_token(tmp_path):
    model = _load(tmp_path, GGMLType.F32, "dequant")
    ids = list(np.random.default_rng(0).integers(0, model.cfg.vocab_size, 20))
    ids = [int(i) for i in ids]
    want = per_token_ppl(model, ids)
    got = perplexity(model, ids, chunk=8, cache_len=32)["ppl"]
    assert abs(got - want) / want < 1e-3


def test_q8_0_ppl_tracks_f32(tmp_path):
    ids = [int(i) for i in np.random.default_rng(1).integers(0, 96, 24)]
    f32 = perplexity(_load(tmp_path, GGMLType.F32, "dequant"), ids, chunk=8, cache_len=32)["ppl"]
    q8 = perplexity(_load(tmp_path, GGMLType.Q8_0, "quant"), ids, chunk=8, cache_len=32)["ppl"]
    # same random weights, Q8_0-rounded: ppl must be within a few percent
    assert abs(q8 - f32) / f32 < 0.05


def test_long_text_sliding_window_counts_every_token(tmp_path):
    """Texts longer than the cache must score EVERY target once via sliding
    windows (round-1 regression: silently truncated to the first cache_len)."""
    model = _load(tmp_path, GGMLType.F32, "dequant")
    ids = [int(i) for i in np.random.default_rng(3).integers(0, model.cfg.vocab_size, 70)]
    r = perplexity(model, ids, chunk=8, cache_len=24)  # 3 windows minimum
    assert r["tokens"] == len(ids) - 1
    assert math.isfinite(r["ppl"]) and r["ppl"] > 0


def test_sliding_window_matches_full_context_scoring(tmp_path):
    """With stride == cache_len - chunk overlap... sanity: the sliding result
    over a text that FITS the cache must equal single-window scoring exactly
    (window logic must not change the short-text path)."""
    model = _load(tmp_path, GGMLType.F32, "dequant")
    ids = [int(i) for i in np.random.default_rng(4).integers(0, model.cfg.vocab_size, 30)]
    full = perplexity(model, ids, chunk=8, cache_len=32)
    assert full["tokens"] == len(ids) - 1
    want = per_token_ppl(model, ids)
    assert abs(full["ppl"] - want) / want < 1e-3


def test_sliding_window_context_quality(tmp_path):
    """Each window re-ingests cache_len - stride tokens as context, so the
    sliding ppl must land close to the infinite-context ppl (here: a cache
    that fits the whole text) — NOT the ppl of independent fragments."""
    model = _load(tmp_path, GGMLType.F32, "dequant")
    ids = [int(i) for i in np.random.default_rng(5).integers(0, model.cfg.vocab_size, 64)]
    full = perplexity(model, ids, chunk=8, cache_len=64)["ppl"]
    slid = perplexity(model, ids, chunk=8, cache_len=32)["ppl"]
    assert abs(slid - full) / full < 0.25  # random tiny model: loose bound
