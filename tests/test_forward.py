"""Numerics parity: JAX unified transformer graph vs the numpy oracle
(reference CPU forward semantics), per family and quant mode."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from oracle import Oracle
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.models.transformer import forward_tokens, init_cache


def _load(tmp_path, family, quant, mode, seed=0):
    path = tmp_path / f"{family}.gguf"
    tensors = tiny_models.build_tiny_gguf(path, family=family, quant=quant, seed=seed)
    model = mloader.load_model(str(path), mode=mode, param_dtype=jnp.float32,
                               load_tokenizer=False)
    # oracle sees the same (possibly quantization-lossy) weights the engine does
    from llamatpu.gguf import GGUFReader

    with GGUFReader(str(path)) as r:
        deq = {name: r.tensor_f32(name) for name in r.tensor_infos}
    return model, deq


FAMILIES = ["llama", "mistral", "qwen2", "qwen3", "phi3", "granite", "deepseek", "qwen2moe", "devstral"]


@pytest.mark.parametrize("family", FAMILIES)
def test_decode_matches_oracle(tmp_path, family):
    model, deq = _load(tmp_path, family, GGMLType.F32, mode="dequant")
    cfg = model.cfg
    orc = Oracle(cfg, deq, family)
    cache = init_cache(cfg, batch=1, dtype=jnp.float32)
    tokens = [3, 17, 42, 7]
    for pos, tok in enumerate(tokens):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(
            cfg, model.weights, jnp.array([[tok]], jnp.int32), cache, pos, last_logit_only=True)
        got = np.asarray(logits[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_prefill_equals_sequential_decode(tmp_path):
    model, deq = _load(tmp_path, "llama", GGMLType.F32, mode="dequant")
    cfg = model.cfg
    toks = jnp.array([[5, 9, 23, 41, 8]], jnp.int32)
    cache1 = init_cache(cfg, batch=1, dtype=jnp.float32)
    logits_pre, cache1 = forward_tokens(cfg, model.weights, toks, cache1, 0)
    cache2 = init_cache(cfg, batch=1, dtype=jnp.float32)
    seq = []
    for pos in range(toks.shape[1]):
        lg, cache2 = forward_tokens(cfg, model.weights, toks[:, pos : pos + 1], cache2, pos,
                                    last_logit_only=True)
        seq.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.asarray(logits_pre[0]), np.stack(seq), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache1.kv), np.asarray(cache2.kv), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("family", ["llama", "qwen3"])
def test_q8_0_quant_mode_matches_oracle(tmp_path, family):
    # oracle runs on the dequantized values of the SAME quantized file, so the
    # comparison isolates the engine's int8+scales matmul path
    model, deq = _load(tmp_path, family, GGMLType.Q8_0, mode="quant")
    cfg = model.cfg
    orc = Oracle(cfg, deq, family)
    cache = init_cache(cfg, batch=1, dtype=jnp.float32)
    for pos, tok in enumerate([3, 17, 42]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(
            cfg, model.weights, jnp.array([[tok]], jnp.int32), cache, pos, last_logit_only=True)
        np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=5e-3, atol=5e-3)


def test_q4_0_quant_mode_matches_oracle(tmp_path):
    model, deq = _load(tmp_path, "llama", GGMLType.Q4_0, mode="quant")
    cfg = model.cfg
    orc = Oracle(cfg, deq, "llama")
    cache = init_cache(cfg, batch=1, dtype=jnp.float32)
    for pos, tok in enumerate([3, 17]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(
            cfg, model.weights, jnp.array([[tok]], jnp.int32), cache, pos, last_logit_only=True)
        np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=5e-3, atol=5e-3)


def test_batched_decode_matches_single(tmp_path):
    model, _ = _load(tmp_path, "llama", GGMLType.F32, mode="dequant")
    cfg = model.cfg
    cache_b = init_cache(cfg, batch=2, dtype=jnp.float32)
    toks = jnp.array([[4], [11]], jnp.int32)
    logits_b, _ = forward_tokens(cfg, model.weights, toks, cache_b, 0, last_logit_only=True)
    for i in range(2):
        cache1 = init_cache(cfg, batch=1, dtype=jnp.float32)
        lg, _ = forward_tokens(cfg, model.weights, toks[i : i + 1], cache1, 0, last_logit_only=True)
        np.testing.assert_allclose(np.asarray(logits_b[i]), np.asarray(lg[0]), rtol=1e-5, atol=1e-5)
