"""Block-level prefix caching for the paged continuous-batching engine.

Exactness contract: with the prefix cache on, every request's output must
bit-match the dense single-sequence reference (greedy), whether its prefix was
served cold (full prefill) or warm (cached blocks mapped into the lane table).
No reference counterpart — the reference re-ingests every prompt from pos 0
(server/InferenceService.java:58-99).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.runtime.batch_engine import BatchEngine
from llamatpu.runtime.paged_cache import BlockAllocator, block_hashes
from llamatpu.runtime.paged_engine import PagedBatchEngine
from llamatpu.runtime.scheduler import BatchRequest, ContinuousBatcher


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("pfx") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=11)
    return mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                              load_tokenizer=False)


def _run(batcher, prompt, n):
    s = batcher.submit(BatchRequest(list(prompt), n))
    out = list(s)
    return out, s.cached_tokens


def _dense_ref(model, prompt, n):
    e = BatchEngine(model, batch_size=1, cache_dtype=jnp.float32, decode_window=4)
    return e.generate_batch([list(prompt)], n)[0]


def test_warm_bitmatches_cold(model):
    """Identical request twice: 2nd is served from cached blocks, same output."""
    prompt = [3, 7, 11, 15, 19, 23, 2, 5]  # 2 full blocks @ bs=4
    ref = _dense_ref(model, prompt, 6)
    e = PagedBatchEngine(model, batch_size=2, block_size=4, cache_dtype=jnp.float32,
                         decode_window=4, prefill_chunk=4)
    b = ContinuousBatcher(e, stop_tokens=set())
    cold, cached0 = _run(b, prompt, 6)
    warm, cached1 = _run(b, prompt, 6)
    b.shutdown()
    assert cold == ref and warm == ref
    assert cached0 == 0
    # reuse is capped at len(prompt)-1 -> only the first block (4 tokens) of
    # the 8-token prompt... actually blocks 0 (tokens 0-3) matches; block 1
    # ends exactly at len(prompt) so it is capped out (need >=1 prefill token)
    assert cached1 == 4


def test_shared_prefix_divergent_suffix(model):
    """Two prompts sharing a block-aligned prefix: the 2nd reuses the shared
    blocks and still matches its own dense reference."""
    p1 = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    p2 = [1, 2, 3, 4, 5, 6, 7, 8, 30, 31]  # shares blocks 0,1 (bs=4)
    r1 = _dense_ref(model, p1, 5)
    r2 = _dense_ref(model, p2, 5)
    e = PagedBatchEngine(model, batch_size=2, block_size=4, cache_dtype=jnp.float32,
                         decode_window=4, prefill_chunk=4)
    b = ContinuousBatcher(e, stop_tokens=set())
    o1, c1 = _run(b, p1, 5)
    o2, c2 = _run(b, p2, 5)
    b.shutdown()
    assert o1 == r1 and o2 == r2
    assert c1 == 0 and c2 == 8


def test_generated_blocks_reused_chat_continuation(model):
    """Chat-session pattern: turn 2 replays turn 1's prompt + generated text;
    blocks covering GENERATED tokens are also served from cache."""
    p1 = [9, 8, 7, 6]
    e = PagedBatchEngine(model, batch_size=2, block_size=4, cache_dtype=jnp.float32,
                         decode_window=4, prefill_chunk=4)
    b = ContinuousBatcher(e, stop_tokens=set())
    g1, _ = _run(b, p1, 8)
    p2 = p1 + g1 + [17, 18, 19]
    ref = _dense_ref(model, p2, 5)
    o2, c2 = _run(b, p2, 5)
    b.shutdown()
    assert o2 == ref
    # verified history = prompt(4) + generated(8) - last = 11 -> blocks 0,1
    # registered; prompt2 len 15, cap 14 -> both cached blocks hit
    assert c2 == 8


def test_eviction_under_pressure(model):
    """A pool too small to keep all cached blocks must evict LRU cached blocks
    (never live ones) and stay exact."""
    e = PagedBatchEngine(model, batch_size=1, block_size=4, n_blocks=6,
                         cache_dtype=jnp.float32, decode_window=4,
                         prefill_chunk=4, max_len=20)
    b = ContinuousBatcher(e, stop_tokens=set())
    prompts = [[1 + i, 2 + i, 3 + i, 4 + i, 5 + i] for i in range(4)]
    refs = [_dense_ref(model, p, 4) for p in prompts]
    outs = [_run(b, p, 4)[0] for p in prompts]
    # replay the FIRST prompt: its block may or may not have survived
    # eviction, but output must be exact either way
    out0, _ = _run(b, prompts[0], 4)
    b.shutdown()
    assert outs == refs
    assert out0 == refs[0]


def test_allocator_refcounts_and_lru():
    a = BlockAllocator(n_blocks=6, n_lanes=3, max_blocks_per_lane=4)
    h = block_hashes([1, 2, 3, 4, 5, 6, 7, 8], 4)
    assert len(h) == 2 and h[0] != h[1]
    # chain property: same first block, different second
    h2 = block_hashes([1, 2, 3, 4, 9, 9, 9, 9], 4)
    assert h2[0] == h[0] and h2[1] != h[1]

    # lane 0 computes both blocks privately, releases with history
    assert a.ensure(0, 8, 4)
    blocks = list(a._lane_blocks[0])
    a.release(0, h)
    assert a.cached_blocks() == 2
    assert a.free_blocks() == 5  # 3 free + 2 evictable (6 - trash - 2 + 2)

    # lane 1 acquires the chain, lane 2 acquires it too (refcount 2)
    n = a.acquire_prefix(1, h, 2)
    assert n == 2 and a._lane_shared[1] == blocks
    n = a.acquire_prefix(2, h, 2)
    assert n == 2
    assert a._ref[blocks[0]] == 2
    # shared blocks are not evictable while referenced
    assert a.free_blocks() == 3
    a.release(1, None)
    assert a._ref[blocks[0]] == 1
    a.release(2, None)
    assert blocks[0] not in a._ref and a.cached_blocks() == 2

    # exhaust the free list: eviction reclaims the LRU cached block
    assert a.ensure(0, 16, 4)  # needs 4 blocks: 3 free + 1 evicted
    assert a.cached_blocks() == 1
    a.release(0, None)


def test_prefix_cache_off(model):
    e = PagedBatchEngine(model, batch_size=1, block_size=4, cache_dtype=jnp.float32,
                         decode_window=4, prefill_chunk=4, prefix_cache=False)
    b = ContinuousBatcher(e, stop_tokens=set())
    p = [5, 6, 7, 8, 9]
    ref = _dense_ref(model, p, 4)
    o1, c1 = _run(b, p, 4)
    o2, c2 = _run(b, p, 4)
    b.shutdown()
    assert o1 == ref and o2 == ref
    assert c1 == 0 and c2 == 0
    assert e.alloc.cached_blocks() == 0
