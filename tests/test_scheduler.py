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


def test_interleaved_chunked_prefill_no_corruption(model):
    """A multi-chunk prompt admitted into a REUSED lane while the other lane
    keeps decoding: chunked prefill interleaves with decode windows, and the
    reused lane's stale position must not corrupt the fresh KV (inactive-lane
    writes are parked in the physical slack row)."""
    pA, pB = [5, 9, 23], [41, 8]
    pC = list(range(2, 42, 2))  # 20 tokens -> 3 chunks at prefill_chunk=8
    refA = greedy_ref(model, pA, 4)
    refB = greedy_ref(model, pB, 24)
    refC = greedy_ref(model, pC, 6)

    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32,
                     prefill_chunk=8, decode_window=4)
    batcher = ContinuousBatcher(be, stop_tokens=set(), interleave_decode_steps=2)
    sB = batcher.submit(BatchRequest(pB, 24))
    sA = batcher.submit(BatchRequest(pA, 4))
    outA = list(sA)           # lane frees with a stale position
    sC = batcher.submit(BatchRequest(pC, 6))  # reuses the lane mid-B-decode
    outC = list(sC)
    outB = list(sB)
    batcher.shutdown()
    assert outA == refA and outB == refB and outC == refC


def test_interleaved_prefill_paged_shared_blocks(model):
    """Same hazard through the paged engine: while a reused lane chunk-prefills
    a prompt whose table leads with prefix-cache SHARED blocks, the stale-pos
    rewrite would land in (and corrupt) a cached block shared across requests —
    inactive lanes must write to the trash block instead."""
    from llamatpu.runtime.paged_engine import PagedBatchEngine

    pfx = list(range(3, 35, 2))           # 16 tokens = 4 full blocks at bs=4
    pB = [41, 8]
    warm_prompt = pfx + [50, 51]
    ref_warm = greedy_ref(model, warm_prompt, 6)
    refB = greedy_ref(model, pB, 24)

    e = PagedBatchEngine(model, batch_size=2, block_size=4, n_blocks=40,
                         cache_dtype=jnp.float32, prefill_chunk=8,
                         decode_window=4, prefix_cache=True)
    b = ContinuousBatcher(e, stop_tokens=set(), interleave_decode_steps=2)
    sB = b.submit(BatchRequest(pB, 24))            # keeps lane 1 decoding
    s1 = b.submit(BatchRequest(pfx + [90], 2))     # seeds the prefix cache
    list(s1)
    s2 = b.submit(BatchRequest(warm_prompt, 6))    # reuses shared blocks
    out2 = list(s2)
    assert s2.cached_tokens > 0
    outB = list(sB)
    # a third warm request checks the shared blocks survived the interleave
    s3 = b.submit(BatchRequest(warm_prompt, 6))
    out3 = list(s3)
    b.shutdown()
    assert out2 == ref_warm and out3 == ref_warm and outB == refB


def test_budget_respected(model):
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32, decode_window=4)
    batcher = ContinuousBatcher(be, stop_tokens=set())
    s = batcher.submit(BatchRequest([1, 2, 3], 3))
    out = list(s)
    assert len(out) == 3 and s.finish_reason == "length"
    batcher.shutdown()


def test_paged_backpressure_no_overcommit(model):
    """Two prompts that can't BOTH fit the paged pool: admission must reserve
    the full prompt span up front, so the second request waits in the backlog
    instead of both being admitted and one starving mid-prefill (which raised
    through the scheduler loop and truncated every in-flight stream)."""
    from llamatpu.runtime.paged_engine import PagedBatchEngine

    p1 = list(range(2, 42, 2))   # 20 tokens: needs ceil((20+4+1)/4)=7 blocks
    p2 = list(range(3, 43, 2))
    ref1 = greedy_ref(model, p1, 4)
    ref2 = greedy_ref(model, p2, 4)

    # 9 blocks - 1 trash = 8 usable: only ONE lane's 7-block span fits at a
    # time; under the old lazy per-chunk allocation both prompts admitted and
    # one raised 'paged KV pool exhausted' at its third chunk
    e = PagedBatchEngine(model, batch_size=2, block_size=4, n_blocks=9,
                         cache_dtype=jnp.float32, prefill_chunk=8,
                         decode_window=4, prefix_cache=False)
    b = ContinuousBatcher(e, stop_tokens=set(), interleave_decode_steps=2)
    s1 = b.submit(BatchRequest(p1, 4))
    s2 = b.submit(BatchRequest(p2, 4))
    out1, out2 = list(s1), list(s2)
    b.shutdown()
    assert out1 == ref1 and s1.finish_reason == "length"
    assert out2 == ref2 and s2.finish_reason == "length"


def test_cache_end_window_shrink(model):
    """A lane decoding near the cache end must shrink the quantized window
    (pow2 floor of the remaining room) instead of overshooting the physical
    cache, and still finish with the 'length' reason at the right count."""
    be = BatchEngine(model, batch_size=2, cache_len=48, cache_dtype=jnp.float32,
                     decode_window=8, prefill_chunk=16)
    batcher = ContinuousBatcher(be, stop_tokens=set())
    prompt = list(range(2, 40))  # 38 tokens: room for ~8 generated
    stream = batcher.submit(BatchRequest(prompt, 64))
    toks = list(stream)
    batcher.shutdown()
    assert stream.finish_reason == "length"
    # budget capped by cache room: pos must stay inside the physical cache
    assert 1 <= len(toks) <= 48 - len(prompt)


def test_budget_trim_exact_under_quantized_windows(model):
    """Host-side budget enforcement: max_new smaller than the decode window
    must emit EXACTLY max_new tokens (device overshoot trimmed)."""
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32,
                     decode_window=8)
    batcher = ContinuousBatcher(be, stop_tokens=set())
    outs = [list(batcher.submit(BatchRequest([5, 9, 23], n))) for n in (3, 5, 1)]
    batcher.shutdown()
    assert [len(o) for o in outs] == [3, 5, 1]
    ref = greedy_ref(model, [5, 9, 23], 5)
    assert outs[1] == ref[:5]
