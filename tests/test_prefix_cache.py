"""KV prefix caching across serialized-service requests: warm results must
bit-match cold ones (greedy), shared-system-prompt prefixes must be reused,
and the opt-out must behave like the reference (full re-prefill)."""
import jax.numpy as jnp
import pytest

import tiny_models
from llamatpu.models import loader as mloader
from llamatpu.runtime.engine import Engine
from llamatpu.server.service import InferenceService, Request


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("pfx") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", with_tokenizer=True, seed=37)
    return mloader.load_model(str(path), param_dtype=jnp.float32)


def _svc(model, **kw):
    engine = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                    decode_window=4)
    return InferenceService(model, engine, **kw)


SYS = {"role": "system", "content": "sys"}  # tiny ctx (64): keep prompts short


def test_identical_request_served_from_prefix(model):
    svc = _svc(model)
    req = Request(messages=[SYS, {"role": "user", "content": "hi"}],
                  max_tokens=16, temperature=0.0)
    r1 = svc.generate(req)
    assert r1.cached_tokens == 0
    r2 = svc.generate(req)
    assert r2.text == r1.text
    assert r2.finish_reason == r1.finish_reason
    # whole prompt minus the final token reused
    assert r2.cached_tokens == r1.prompt_tokens - 1


def test_shared_system_prefix_bitmatches_cold(model):
    warm = _svc(model)
    a = Request(messages=[SYS, {"role": "user", "content": "one"}],
                max_tokens=12, temperature=0.0)
    b = Request(messages=[SYS, {"role": "user", "content": "two"}],
                max_tokens=12, temperature=0.0)
    warm.generate(a)
    rb_warm = warm.generate(b)
    assert rb_warm.cached_tokens > 0  # at least BOS + system turn reused

    cold = _svc(model)
    rb_cold = cold.generate(b)
    assert rb_warm.text == rb_cold.text
    assert rb_warm.finish_reason == rb_cold.finish_reason


def test_multiturn_conversation_replay_reuses_prefix(model):
    svc = _svc(model)
    turn1 = [{"role": "user", "content": "hi"}]
    r1 = svc.generate(Request(messages=turn1, max_tokens=8, temperature=0.0))
    turn2 = turn1 + [{"role": "assistant", "content": r1.text},
                     {"role": "user", "content": "and again"}]
    r2 = svc.generate(Request(messages=turn2, max_tokens=8, temperature=0.0))
    # the replayed first turn is a shared prefix
    assert r2.cached_tokens > 0


def test_prefix_cache_disabled(model):
    svc = _svc(model, prefix_cache=False)
    req = Request(messages=[SYS, {"role": "user", "content": "hello"}],
                  max_tokens=8, temperature=0.0)
    r1 = svc.generate(req)
    r2 = svc.generate(req)
    assert r1.cached_tokens == 0 and r2.cached_tokens == 0
    assert r2.text == r1.text


def test_divergent_prompt_not_poisoned(model):
    """A completely different prompt after a cached one must equal cold."""
    svc = _svc(model)
    svc.generate(Request(messages=[SYS, {"role": "user", "content": "aaaa"}],
                         max_tokens=8, temperature=0.0))
    other = Request(messages=[{"role": "user", "content": "zzzz"}],
                    max_tokens=8, temperature=0.0)
    r_warm = svc.generate(other)
    r_cold = _svc(model).generate(other)
    assert r_warm.text == r_cold.text
