"""Native Q5_K compute path (VERDICT r4 #9): q5_k_views must reconstruct the
reference dequant exactly (Q5_KFloatTensor.java semantics), the int8 kernel
set must match the dequant matmul with the offs epilogue, and a Q5_K GGUF
must LOAD native (no Q8_0 requant — the old path double-rounded) and match
the oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType, GGUFReader, GGUFWriter, quants
from llamatpu.models import loader as mloader
from llamatpu.models.weights import (QTensor, prepare_qtensor,
                                     quantize_array_q5_k)
from llamatpu.ops.matmul import matmul


def test_q5k_views_reconstruct_reference_dequant():
    rng = np.random.default_rng(7)
    vals = rng.normal(size=4096).astype(np.float32)
    raw = quants.quantize_q5_k(vals)
    want = quants.dequantize_q5_k(raw, vals.size)
    qs, scales, offs = quants.q5_k_views(raw, vals.size)
    assert qs.min() >= -16 and qs.max() <= 15
    got = (qs.astype(np.float32) * scales[:, None] + offs[:, None]).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # 5-bit asymmetric quantization of N(0,1): step ~ 4.4sigma/31, mean |err|
    # ~ step/4 ~ 0.035 — and strictly tighter than the q4_k class
    err = np.abs(want - vals)
    assert err.mean() < 0.05, err.mean()


def test_q5k_tighter_than_q4k_and_requant():
    """The whole point: native Q5_K must beat both the Q4 class and the OLD
    Q8_0-requant path cannot be exact — native reconstruction IS the encode's
    own dequant (zero extra loss)."""
    rng = np.random.default_rng(3)
    vals = rng.normal(size=8192).astype(np.float32)
    raw5 = quants.quantize_q5_k(vals)
    deq5 = quants.dequantize_q5_k(raw5, vals.size)
    raw4 = quants.quantize_q4_k(vals)
    deq4 = quants.dequantize_q4_k(raw4, vals.size)
    assert np.abs(deq5 - vals).mean() < np.abs(deq4 - vals).mean() * 0.7
    # requant-to-q8_0 of the q5_k values adds a second rounding
    rq = quants.requantize_to_q8_0(GGMLType.Q5_K, raw5, vals.size)
    deq_rq = quants.dequantize_q8_0(rq, vals.size)
    requant_err = np.abs(deq_rq - deq5)
    assert requant_err.max() > 0  # the old path was lossy...
    qs, sc, off = quants.q5_k_views(raw5, vals.size)
    native = (qs.astype(np.float32) * sc[:, None] + off[:, None]).reshape(-1)
    np.testing.assert_array_equal(native, deq5)  # ...the native path is not


def test_q5k_encoder_edge_blocks():
    for vals in (np.zeros(256, np.float32),
                 np.abs(np.random.default_rng(0).normal(size=256)).astype(np.float32),
                 -np.abs(np.random.default_rng(1).normal(size=256)).astype(np.float32)):
        raw = quants.quantize_q5_k(vals)
        deq = quants.dequantize_q5_k(raw, 256)
        assert np.isfinite(deq).all()
        qs, sc, off = quants.q5_k_views(raw, 256)
        got = (qs.astype(np.float32) * sc[:, None] + off[:, None]).reshape(-1)
        np.testing.assert_allclose(got, deq, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("t", [1, 8, 128])
def test_q5k_pallas_matmul_matches_dequant(t):
    rng = np.random.default_rng(11)
    o, i = 128, 256
    w = quantize_array_q5_k(rng.normal(size=(o, i)).astype(np.float32))
    wp = prepare_qtensor(w)
    assert wp.kind == "q5_k" and wp.offs is not None
    assert wp.layout == "interleaved"  # no pack4: 5-bit values exceed nibbles
    x = jnp.asarray(rng.normal(size=(t, i)).astype(np.float32))
    got = matmul(wp, x, impl="pallas")
    want = np.asarray(x, np.float32) @ np.asarray(w.dequant()).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_q5k_stacked_matmul_matches_dequant():
    rng = np.random.default_rng(13)
    L, o, i = 3, 128, 256
    w = quantize_array_q5_k(rng.normal(size=(L, o, i)).astype(np.float32))
    wp = prepare_qtensor(w)
    x = jnp.asarray(rng.normal(size=(1, i)).astype(np.float32))
    for li in range(L):
        got = matmul(wp, x, impl="pallas", li=jnp.int32(li))
        want = np.asarray(x, np.float32) @ np.asarray(
            quants_dequant_layer(w, li)).T
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def quants_dequant_layer(w, li):
    return np.asarray(w.dequant())[li]


def test_q5k_gguf_loads_native_and_matches_oracle(tmp_path):
    from oracle import Oracle
    from llamatpu.models.transformer import forward_tokens, init_cache

    src = tmp_path / "f32.gguf"
    tiny_models.build_tiny_gguf(src, family="llama", quant=GGMLType.F32, seed=53)
    with GGUFReader(str(src)) as r:
        md = dict(r.metadata)
        md.pop("tokenizer.ggml.tokens.length", None)
        tensors = {n: r.tensor_f32(n) for n in r.tensor_infos}

    w = GGUFWriter()
    for k, v in md.items():
        w.add(k, v)
    kq = tmp_path / "q5k.gguf"
    for name, arr in tensors.items():
        if arr.ndim >= 2 and arr.size % 256 == 0 and arr.shape[-1] % 32 == 0 \
                and "norm" not in name:
            w.add_tensor_raw(name, arr.shape, GGMLType.Q5_K,
                             quants.quantize_q5_k(arr.reshape(-1)).tobytes())
        else:
            w.add_tensor(name, arr, GGMLType.F32)
    w.write(str(kq))

    model = mloader.load_model(str(kq), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    wq = model.weights["layers"]["wq"]
    assert isinstance(wq, QTensor) and wq.kind == "q5_k"  # NATIVE, no requant
    assert wq.offs is not None

    with GGUFReader(str(kq)) as r:
        deq = {n: r.tensor_f32(n) for n in r.tensor_infos}
    orc = Oracle(model.cfg, deq, "llama")
    cache = init_cache(model.cfg, 1, jnp.float32)
    for pos, tok in enumerate([3, 17]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(model.cfg, model.weights,
                                       jnp.array([[tok]], jnp.int32), cache,
                                       pos, last_logit_only=True)
        np.testing.assert_allclose(np.asarray(logits[0]), want,
                                   rtol=2e-3, atol=2e-3)
