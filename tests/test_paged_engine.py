"""Paged KV cache: paged batched generation must equal dense batched
generation exactly; blocks are recycled; the pool backpressures admission."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.runtime.batch_engine import BatchEngine
from llamatpu.runtime.paged_engine import PagedBatchEngine
from llamatpu.runtime.scheduler import BatchRequest, ContinuousBatcher


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("pg") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=37)
    return mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                              load_tokenizer=False)


def test_paged_matches_dense(model):
    prompts = [[5, 9, 23], [41, 8], [2, 30, 7, 19]]
    dense = BatchEngine(model, batch_size=4, cache_dtype=jnp.float32,
                        decode_window=4).generate_batch(prompts, 6)
    paged = PagedBatchEngine(model, batch_size=4, block_size=8,
                             cache_dtype=jnp.float32, decode_window=4)
    outs = paged.generate_batch(prompts, 6)
    assert outs == dense


def test_paged_block_boundary_crossing(model):
    # block_size 4 forces several block crossings during prefill AND decode
    prompts = [[5, 9, 23, 41, 8, 2, 30]]
    dense = BatchEngine(model, batch_size=1, cache_dtype=jnp.float32,
                        decode_window=4).generate_batch(prompts, 8)
    paged = PagedBatchEngine(model, batch_size=1, block_size=4,
                             cache_dtype=jnp.float32, decode_window=4,
                             prefill_chunk=4)
    assert paged.generate_batch(prompts, 8) == dense


def test_blocks_recycled_and_backpressure(model):
    # pool holds only ~1.5 lanes' worth of blocks: second request must wait
    # until the first lane's blocks are released, then still be exact
    e = PagedBatchEngine(model, batch_size=2, block_size=8, n_blocks=7,
                         cache_dtype=jnp.float32, decode_window=4, max_len=24)
    batcher = ContinuousBatcher(e, stop_tokens=set())
    dense = BatchEngine(model, batch_size=1, cache_dtype=jnp.float32,
                        decode_window=4)
    refs = [dense.generate_batch([p], 5)[0] for p in ([1, 2, 3], [4, 5, 6])]
    dense.reset()
    s1 = batcher.submit(BatchRequest([1, 2, 3], 5))
    s2 = batcher.submit(BatchRequest([4, 5, 6], 5))
    out1, out2 = list(s1), list(s2)
    batcher.shutdown()
    assert out1 == refs[0]
    assert out2 == refs[1]
    assert e.alloc.free_blocks() == 6  # everything recycled (7 - trash)


def test_paged_int8_kv_matches_dense_int8(model):
    """int8 KV in the paged pool (per-position scales ride their own pools,
    gathered alongside the blocks) must generate the same ids as the dense
    int8 cache."""
    prompts = [[5, 9, 23, 41, 8], [2, 30, 7]]
    dense = BatchEngine(model, batch_size=2, cache_dtype=jnp.int8,
                        decode_window=4).generate_batch(prompts, 6)
    paged = PagedBatchEngine(model, batch_size=2, block_size=4,
                             cache_dtype=jnp.int8, decode_window=4,
                             prefill_chunk=4)
    assert paged.generate_batch(prompts, 6) == dense


def test_paged_int8_prefix_cache_warm_matches_cold(model):
    """Prefix caching composes with int8 paged KV: cached blocks carry their
    scale rows, warm output == cold output."""
    from llamatpu.runtime.scheduler import ContinuousBatcher

    prompt = [3, 7, 11, 15, 19, 23, 2, 5, 6]
    e = PagedBatchEngine(model, batch_size=2, block_size=4, cache_dtype=jnp.int8,
                         decode_window=4, prefill_chunk=4)
    b = ContinuousBatcher(e, stop_tokens=set())
    s1 = b.submit(BatchRequest(list(prompt), 6))
    cold = list(s1)
    s2 = b.submit(BatchRequest(list(prompt), 6))
    warm = list(s2)
    b.shutdown()
    assert warm == cold
    assert s1.cached_tokens == 0 and s2.cached_tokens == 8


def test_paged_pallas_decode_matches_dense_pallas(model):
    """impl=pallas routes decode through the block-table DMA kernel; output
    must match the dense-cache pallas engine."""
    prompts = [[5, 9, 23, 41, 8], [2, 30, 7]]
    dense = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32,
                        decode_window=4, impl="pallas").generate_batch(prompts, 6)
    paged = PagedBatchEngine(model, batch_size=2, block_size=16,
                             cache_dtype=jnp.float32, decode_window=4,
                             impl="pallas")
    assert paged.generate_batch(prompts, 6) == dense


def test_paged_pallas_int8_decode(model):
    prompts = [[5, 9, 23, 41, 8]]
    dense = BatchEngine(model, batch_size=1, cache_dtype=jnp.int8,
                        decode_window=4, impl="pallas").generate_batch(prompts, 6)
    paged = PagedBatchEngine(model, batch_size=1, block_size=16,
                             cache_dtype=jnp.int8, decode_window=4,
                             impl="pallas")
    assert paged.generate_batch(prompts, 6) == dense
