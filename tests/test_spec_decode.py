"""Prompt-lookup speculative decoding: greedy output must be IDENTICAL to
plain greedy decoding (speculation only changes how many forwards produce it),
for accepting and rejecting drafts, stop tokens, and tight budgets."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("spec") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=23)
    return mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                              load_tokenizer=False)


def _pair(model, k):
    ref = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                 decode_window=6)
    spec = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                  decode_window=6, spec_decode=k)
    return ref, spec


def test_spec_matches_greedy_random_prompt(model):
    """Random prompt: drafts mostly reject — output still identical."""
    ref, spec = _pair(model, 4)
    prompt = [5, 9, 23, 41, 8, 2]
    r = ref.generate(prompt, 10).tokens
    s = spec.generate(prompt, 10).tokens
    assert s == r


def test_spec_matches_greedy_repetitive_prompt(model):
    """Repetitive prompt: the bigram lookup finds continuations — accepted
    drafts must not change the output."""
    ref, spec = _pair(model, 4)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]
    r = ref.generate(prompt, 12).tokens
    s = spec.generate(prompt, 12).tokens
    assert s == r


def test_spec_respects_stop_tokens_and_budget(model):
    ref, spec = _pair(model, 4)
    prompt = [3, 1, 4, 1, 5]
    r = ref.generate(prompt, 8).tokens
    # use the greedy continuation's 3rd token as a stop token
    stop = {r[2]}
    r2 = ref.generate(prompt, 8, stop_tokens=stop)
    s2 = spec.generate(prompt, 8, stop_tokens=stop)
    assert s2.tokens == r2.tokens
    assert s2.stop_reason == r2.stop_reason == "stop_token"
    # budget exactness
    assert spec.generate(prompt, 3).tokens == ref.generate(prompt, 3).tokens
    assert len(spec.generate(prompt, 3).tokens) == 3


def test_spec_multiturn_continuation(model):
    """KV continuation across calls (chat session pattern: the last generated
    token is re-fed next turn since its KV was never written) stays exact."""
    ref, spec = _pair(model, 3)
    p1 = [11, 12, 13, 14]
    r1 = ref.generate(p1, 5).tokens
    s1 = spec.generate(p1, 5).tokens
    assert s1 == r1
    p2 = [r1[-1], 20, 21]
    start = len(p1) + len(r1) - 1
    r2 = ref.generate(p2, 5, start_pos=start).tokens
    s2 = spec.generate(p2, 5, start_pos=start).tokens
    assert s2 == r2


def test_spec_sampled_falls_back(model):
    """temperature > 0 uses the normal sampled path (no speculation)."""
    spec = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                  decode_window=4, spec_decode=4, seed=7)
    ref = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                 decode_window=4, seed=7)
    prompt = [5, 9, 23]
    r = ref.generate(prompt, 6, temperature=0.8, top_p=0.9).tokens
    s = spec.generate(prompt, 6, temperature=0.8, top_p=0.9).tokens
    assert s == r  # same seed, same sampled path


def test_spec_acceptance_telemetry(model):
    """RunMetrics records verify forwards + emitted tokens; on a repetitive
    prompt the lookup accepts drafts, so emitted > forwards (rate > 0)."""
    _, spec = _pair(model, 4)
    prompt = [7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8]
    spec.generate(prompt, 12)
    ex = spec.metrics.extra
    assert ex["spec_forwards"] >= 1
    assert ex["spec_emitted"] >= ex["spec_forwards"]
    assert "spec_accept_rate" in ex
    assert ex["spec_accept_rate"] >= 0.0
