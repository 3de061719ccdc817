"""Int8 KV cache: quantization op bounds, fold-into-dot kernel equivalence,
and end-to-end forward accuracy vs the f32 cache."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.ops.kv_quant import dequantize_kv, quantize_kv
from llamatpu.ops.pallas_attention import (
    decode_attention,
    decode_attention_q,
    decode_attention_split_q,
)


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 5, 4, 32)) * 7.0, jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 5, 4)
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(x))
    bound = np.asarray(s)[..., None] / 2 + 1e-6  # rounding: half a quantum
    assert (err <= bound).all()


def test_quantize_zero_rows_exact():
    x = jnp.zeros((2, 3, 8), jnp.float32)
    q, s = quantize_kv(x)
    assert np.asarray(q).max() == 0 and np.asarray(s).max() == 0.0


def _quantized_cache(rng, b, kv, s, hd):
    k = rng.standard_normal((b, kv, s, hd)).astype(np.float32)
    v = rng.standard_normal((b, kv, s, hd)).astype(np.float32)
    kq, ks = quantize_kv(jnp.asarray(k))
    vq, vs = quantize_kv(jnp.asarray(v))
    kvc = jnp.concatenate([kq, vq], axis=-1)    # packed [B, KV, S, 2hd]
    sc = jnp.stack([ks, vs], axis=2)            # [B, KV, 2, S]
    return kvc, sc


@pytest.mark.parametrize("b,kv,g,hd,s", [(1, 2, 4, 16, 32), (2, 1, 8, 32, 64)])
def test_q_kernel_matches_dequant_reference(b, kv, g, hd, s):
    """Folding scales into the dots must equal dequantize-then-attend."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), jnp.float32)
    kvc, sc = _quantized_cache(rng, b, kv, s, hd)
    pos = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    scale = 1.0 / np.sqrt(hd)
    got = decode_attention_q(q, kvc, sc, pos, scale, hd=hd, interpret=True)
    kd = dequantize_kv(kvc[..., :hd], sc[:, :, 0:1, :])
    vd = dequantize_kv(kvc[..., hd:], sc[:, :, 1:2, :])
    want = decode_attention(q, jnp.concatenate([kd, vd], axis=-1), pos, scale,
                            hd=hd, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_split_q_matches_full_q():
    rng = np.random.default_rng(5)
    b, kv, g, hd, s, tile = 2, 2, 2, 16, 128, 32
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), jnp.float32)
    kvc, sc = _quantized_cache(rng, b, kv, s, hd)
    scale = 1.0 / np.sqrt(hd)
    for pos_list in ([0, 31], [32, 127], [5, 100]):
        pos = jnp.asarray(pos_list, jnp.int32)
        want = decode_attention_q(q, kvc, sc, pos, scale, hd=hd,
                                  interpret=True)
        got = decode_attention_split_q(q, kvc, sc, pos, scale, hd=hd,
                                       s_tile=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from llamatpu.models import loader as mloader

    path = tmp_path_factory.mktemp("kvq") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", with_tokenizer=True, seed=31)
    return mloader.load_model(str(path), param_dtype=jnp.float32)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_forward_int8_cache_close_to_f32(model, impl):
    from llamatpu.models.transformer import forward_tokens, init_cache

    cfg = model.cfg
    toks = jnp.asarray([[3, 17, 42, 9]], jnp.int32)
    c32 = init_cache(cfg, 1, jnp.float32)
    c8 = init_cache(cfg, 1, jnp.int8)
    assert c8.quantized and c8.kv.dtype == jnp.int8
    lg32, c32 = forward_tokens(cfg, model.weights, toks, c32, 0, impl=impl)
    lg8, c8 = forward_tokens(cfg, model.weights, toks, c8, 0, impl=impl)
    # prefill logits: same activations, cache only read for in-window attention
    np.testing.assert_allclose(np.asarray(lg8), np.asarray(lg32),
                               rtol=0.05, atol=0.05)
    # decode step reading the quantized cache
    d32, _ = forward_tokens(cfg, model.weights, jnp.asarray([[7]], jnp.int32),
                            c32, 4, impl=impl, last_logit_only=True)
    d8, _ = forward_tokens(cfg, model.weights, jnp.asarray([[7]], jnp.int32),
                           c8, 4, impl=impl, last_logit_only=True)
    np.testing.assert_allclose(np.asarray(d8), np.asarray(d32),
                               rtol=0.08, atol=0.08)


def test_engine_generates_with_int8_cache(model):
    from llamatpu.runtime.engine import Engine

    e8 = Engine(model, cache_dtype=jnp.int8, aot_compile=False, decode_window=4)
    r8 = e8.generate([1, 5, 9], 12, temperature=0.0)
    assert len(r8.tokens) == 12
    e32 = Engine(model, cache_dtype=jnp.float32, aot_compile=False, decode_window=4)
    r32 = e32.generate([1, 5, 9], 12, temperature=0.0)
    # int8 KV is lossy; on a tiny random model just require the first couple
    # of greedy tokens (dominated by prefill logits) to agree
    assert r8.tokens[:2] == r32.tokens[:2]


def test_sharded_engine_int8_cache(model):
    import jax

    from llamatpu.parallel import make_mesh
    from llamatpu.runtime.engine import Engine

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device CPU mesh")
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    e = Engine(model, cache_dtype=jnp.int8, aot_compile=False,
               decode_window=4, mesh=mesh)
    r = e.generate([1, 5, 9], 8, temperature=0.0)
    assert len(r.tokens) == 8
