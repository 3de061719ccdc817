"""BatchEngine: batched lanes must reproduce single-sequence greedy results
exactly, including mixed prompt lengths and mid-window stops."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.runtime.batch_engine import BatchEngine
from llamatpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("b") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=11)
    return mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                              load_tokenizer=False)


def single_ref(model, prompt, n, stop=frozenset()):
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False, decode_window=4)
    return e.generate(prompt, n, stop_tokens=stop).tokens


def test_batch_matches_single(model):
    prompts = [[5, 9, 23], [41, 8], [2, 30, 7, 19]]
    refs = [single_ref(model, p, 6) for p in prompts]
    be = BatchEngine(model, batch_size=4, cache_dtype=jnp.float32, decode_window=4)
    outs = be.generate_batch(prompts, 6)
    assert outs == refs


def test_batch_with_stop_tokens(model):
    prompts = [[5, 9, 23], [41, 8]]
    chains = [single_ref(model, p, 10) for p in prompts]
    # stop lane 0 early at its 3rd generated token; lane 1 runs longer
    stop = {chains[0][2]}
    refs = [single_ref(model, p, 10, stop) for p in prompts]
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32, decode_window=4)
    outs = be.generate_batch(prompts, 10, stop_tokens=stop)
    assert outs == refs


def test_batch_sampling_lanes_run(model):
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32, decode_window=4)
    outs = be.generate_batch([[1, 2], [3, 4]], 5,
                             temps=np.array([0.0, 0.9]), topps=np.array([0.0, 0.9]))
    assert len(outs[0]) == 5 and len(outs[1]) == 5
    v = model.cfg.vocab_size
    assert all(0 <= t < v for o in outs for t in o)
    # greedy lane must equal the single-engine greedy chain
    assert outs[0] == single_ref(model, [1, 2], 5)
