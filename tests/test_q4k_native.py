"""Native Q4_K compute path (VERDICT r3 #6): q4_k_views must reconstruct the
reference dequant exactly, every kernel layout (interleaved / packed4 /
stacked) must match the dequant matmul with the offs epilogue, MoE q4_k
expert stacks must run the grouped kernels, and a Q4_K GGUF must LOAD native
(no Q8_0 requant) and match the oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType, GGUFReader, GGUFWriter, quants
from llamatpu.models import loader as mloader
from llamatpu.models.weights import (QTensor, prepare_qtensor,
                                     quantize_array_q4_k)
from llamatpu.ops.matmul import matmul


def test_q4k_views_reconstruct_reference_dequant():
    rng = np.random.default_rng(7)
    vals = rng.normal(size=4096).astype(np.float32)
    raw = quants.quantize_q4_k(vals)
    want = quants.dequantize_q4_k(raw, vals.size)
    qs, scales, offs = quants.q4_k_views(raw, vals.size)
    got = (qs.astype(np.float32) * scales[:, None] + offs[:, None]).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # and the encode is a reasonable quantizer (bounded reconstruction error)
    err = np.abs(want - vals)
    # 4-bit asymmetric quantization of N(0,1): step ~ 4.4sigma/15, mean |err|
    # ~ step/4 ~ 0.07
    assert err.mean() < 0.1, err.mean()


def test_q4k_encoder_edge_blocks():
    # all-zero, all-positive, all-negative superblocks must round-trip finite
    for vals in (np.zeros(256, np.float32),
                 np.abs(np.random.default_rng(0).normal(size=256)).astype(np.float32),
                 -np.abs(np.random.default_rng(1).normal(size=256)).astype(np.float32)):
        raw = quants.quantize_q4_k(vals)
        deq = quants.dequantize_q4_k(raw, 256)
        assert np.isfinite(deq).all()
        qs, sc, off = quants.q4_k_views(raw, 256)
        got = (qs.astype(np.float32) * sc[:, None] + off[:, None]).reshape(-1)
        np.testing.assert_allclose(got, deq, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("pack4", [False, True])
@pytest.mark.parametrize("t", [1, 8])
def test_q4k_pallas_matmul_matches_dequant(pack4, t):
    rng = np.random.default_rng(11)
    o, i = 128, 256
    w = quantize_array_q4_k(rng.normal(size=(o, i)).astype(np.float32))
    wp = prepare_qtensor(w, pack4=pack4)
    assert wp.kind == "q4_k" and wp.offs is not None
    assert wp.layout == ("packed4" if pack4 else "interleaved")
    x = jnp.asarray(rng.normal(size=(t, i)).astype(np.float32))
    got = matmul(wp, x, impl="pallas")
    want = np.asarray(x, np.float32) @ np.asarray(w.dequant()).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_q4k_stacked_pallas_matches_dequant():
    rng = np.random.default_rng(13)
    L, o, i = 3, 128, 256
    w = quantize_array_q4_k(rng.normal(size=(L, o, i)).astype(np.float32))
    wp = prepare_qtensor(w)
    x = jnp.asarray(rng.normal(size=(1, i)).astype(np.float32))
    for li in range(L):
        got = matmul(wp, x, impl="pallas", li=jnp.int32(li))
        want = np.asarray(x, np.float32) @ np.asarray(
            quants_deq_layer(w, li)).T
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def quants_deq_layer(w, li):
    from llamatpu.models.transformer import _index_qtensor

    return _index_qtensor(w, li).dequant()


def test_q4k_moe_grouped_matches_xla(tmp_path):
    """q4_k expert stacks through the grouped kernels (offs correction as a
    grouped dense matmul) vs the XLA dequant scan."""
    from llamatpu.models.transformer import forward_tokens, init_cache

    path = tmp_path / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="qwen2moe", quant=GGMLType.F32,
                                seed=37)
    model = mloader.load_model(str(path), mode="dequant",
                               param_dtype=jnp.float32, load_tokenizer=False)
    w = dict(model.weights)
    lw = dict(w["layers"])
    for k in ("gate_exps", "up_exps", "down_exps", "wq", "wk", "wv", "wo",
              "shared_gate", "shared_up", "shared_down"):
        lw[k] = prepare_qtensor(
            quantize_array_q4_k(np.asarray(lw[k], np.float32)))
        assert lw[k].offs is not None
    w["layers"] = lw
    outs = {}
    for impl in ("xla", "pallas"):
        cache = init_cache(model.cfg, 1, jnp.float32)
        logits, _ = forward_tokens(model.cfg, w,
                                   jnp.array([[3, 17, 42]], jnp.int32),
                                   cache, 0, impl=impl, last_logit_only=True)
        outs[impl] = np.asarray(logits[0])
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=3e-4, atol=3e-4)


def test_q4k_gguf_loads_native_and_matches_oracle(tmp_path):
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
    kq = tmp_path / "q4k.gguf"
    for name, arr in tensors.items():
        if arr.ndim >= 2 and arr.size % 256 == 0 and arr.shape[-1] % 32 == 0 \
                and "norm" not in name:
            w.add_tensor_raw(name, arr.shape, GGMLType.Q4_K,
                             quants.quantize_q4_k(arr.reshape(-1)).tobytes())
        else:
            w.add_tensor(name, arr, GGMLType.F32)
    w.write(str(kq))

    model = mloader.load_model(str(kq), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    wq = model.weights["layers"]["wq"]
    assert isinstance(wq, QTensor) and wq.kind == "q4_k"  # NATIVE, no requant
    assert wq.offs is not None

    # oracle runs on the dequantized values of the SAME q4k file — the native
    # path computes on exactly those values, so only matmul rounding separates
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
