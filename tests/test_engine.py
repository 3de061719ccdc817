"""Engine-level tests: chunked prefill + decode generation vs oracle argmax
chain, determinism, KV continuation, padded-final-chunk correctness."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from oracle import Oracle
from llamatpu.gguf import GGMLType, GGUFReader
from llamatpu.models import loader as mloader
from llamatpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "llama.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.F32, seed=3)
    model = mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    with GGUFReader(str(path)) as r:
        deq = {n: r.tensor_f32(n) for n in r.tensor_infos}
    return model, deq


def oracle_greedy_chain(model, deq, prompt, n_steps):
    orc = Oracle(model.cfg, deq, "llama")
    logits = None
    for pos, t in enumerate(prompt):
        logits = orc.forward(t, pos)
    out = []
    tok = int(np.argmax(logits))
    pos = len(prompt)
    for _ in range(n_steps):
        out.append(tok)
        logits = orc.forward(tok, pos)
        tok = int(np.argmax(logits))
        pos += 1
    return out


def test_generate_matches_oracle_greedy(tiny):
    model, deq = tiny
    engine = Engine(model, prefill_chunk=4, cache_dtype=jnp.float32, aot_compile=False)
    prompt = [5, 9, 23, 41, 8, 2, 30]  # 7 tokens -> chunks of 4 + padded 3
    want = oracle_greedy_chain(model, deq, prompt, 6)
    res = engine.generate(prompt, 6)
    assert res.tokens == want
    assert res.stop_reason == "length"


def test_generate_deterministic_and_reset(tiny):
    model, _ = tiny
    engine = Engine(model, prefill_chunk=8, cache_dtype=jnp.float32, aot_compile=False)
    prompt = [1, 2, 3]
    a = engine.generate(prompt, 5).tokens
    engine.reset()
    b = engine.generate(prompt, 5).tokens
    assert a == b


def test_stop_token_halts_generation(tiny):
    model, deq = tiny
    engine = Engine(model, prefill_chunk=8, cache_dtype=jnp.float32, aot_compile=False)
    prompt = [5, 9, 23]
    chain = oracle_greedy_chain(model, deq, prompt, 8)
    stop = {chain[3]}  # force a stop at the 4th generated token
    engine.reset()
    res = engine.generate(prompt, 8, stop_tokens=stop)
    assert res.stop_reason == "stop_token"
    assert res.tokens == chain[:4]


def test_kv_continuation_matches_full_prompt(tiny):
    model, _ = tiny
    e1 = Engine(model, prefill_chunk=8, cache_dtype=jnp.float32, aot_compile=False)
    full = e1.generate([4, 7, 11, 13, 17], 4).tokens
    e2 = Engine(model, prefill_chunk=8, cache_dtype=jnp.float32, aot_compile=False)
    e2.prefill([4, 7], 0)  # first turn ingested
    res = e2.generate([11, 13, 17], 4, start_pos=2)
    assert res.tokens == full


def test_sampling_temperature_runs(tiny):
    model, _ = tiny
    engine = Engine(model, cache_dtype=jnp.float32, temperature=0.8, top_p=0.9,
                    aot_compile=False)
    res = engine.generate([1, 2, 3], 5)
    assert len(res.tokens) == 5
    assert all(0 <= t < model.cfg.vocab_size for t in res.tokens)
