"""Continuous batching: concurrent requests through the scheduler must
reproduce single-engine greedy outputs; lanes admit/free dynamically."""
import threading

import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.runtime.batch_engine import BatchEngine
from llamatpu.runtime.engine import Engine
from llamatpu.runtime.scheduler import BatchRequest, ContinuousBatcher


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("s") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=13)
    return mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                              load_tokenizer=False)


def greedy_ref(model, prompt, n, stop=frozenset()):
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False, decode_window=4)
    return e.generate(prompt, n, stop_tokens=stop).tokens


def test_concurrent_requests_match_single(model):
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32, decode_window=4)
    batcher = ContinuousBatcher(be, stop_tokens=set())
    prompts = [[5, 9, 23], [41, 8], [2, 30, 7], [14, 3]]
    refs = [greedy_ref(model, p, 6) for p in prompts]

    results = [None] * len(prompts)

    def run(i):
        stream = batcher.submit(BatchRequest(prompts[i], 6))
        results[i] = list(stream)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    batcher.shutdown()
    assert results == refs


def test_stop_token_frees_lane(model):
    chain = greedy_ref(model, [5, 9], 8)
    stop = {chain[3]}
    be = BatchEngine(model, batch_size=1, cache_dtype=jnp.float32, decode_window=4)
    batcher = ContinuousBatcher(be, stop_tokens=stop)
    s1 = batcher.submit(BatchRequest([5, 9], 8))
    out1 = list(s1)
    assert out1 == chain[:4] and s1.finish_reason == "stop"
    # lane must be reusable afterwards
    s2 = batcher.submit(BatchRequest([41, 8], 4))
    out2 = list(s2)
    assert out2 == greedy_ref(model, [41, 8], 4)
    batcher.shutdown()


def test_budget_respected(model):
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32, decode_window=4)
    batcher = ContinuousBatcher(be, stop_tokens=set())
    s = batcher.submit(BatchRequest([1, 2, 3], 3))
    out = list(s)
    assert len(out) == 3 and s.finish_reason == "length"
    batcher.shutdown()
