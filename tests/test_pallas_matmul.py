"""Pallas fused dequant-matmul parity vs the dequantize-then-dot reference
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llamatpu.models.weights import QTensor
from llamatpu.ops.pallas_matmul import quant_matmul_pallas


def make_qt(o, i, seed=0):
    rng = np.random.default_rng(seed)
    qs = rng.integers(-127, 128, (o, i), dtype=np.int8)
    scales = (rng.random((o, i // 32)).astype(np.float32) * 0.02 + 0.001)
    return QTensor(jnp.asarray(qs), jnp.asarray(scales), "q8_0")


@pytest.mark.parametrize("o,i,t", [(64, 64, 1), (128, 256, 1), (96, 64, 4), (256, 128, 7)])
def test_matches_dequant_reference(o, i, t):
    w = make_qt(o, i)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((t, i)), jnp.float32)
    y = quant_matmul_pallas(w, x, interpret=True)
    ref = x @ w.dequant(jnp.float32).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_leading_dims_flattened():
    w = make_qt(64, 64)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 64)), jnp.float32)
    y = quant_matmul_pallas(w, x, interpret=True)
    assert y.shape == (2, 3, 64)
    ref = jnp.einsum("bti,oi->bto", x, w.dequant(jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_engine_pallas_impl_matches_oracle(tmp_path):
    import tiny_models
    from oracle import Oracle
    from llamatpu.gguf import GGMLType, GGUFReader
    from llamatpu.models import loader as mloader
    from llamatpu.models.transformer import forward_tokens, init_cache

    path = tmp_path / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.Q8_0, seed=4)
    model = mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    with GGUFReader(str(path)) as r:
        deq = {n: r.tensor_f32(n) for n in r.tensor_infos}
    orc = Oracle(model.cfg, deq, "llama")
    cache = init_cache(model.cfg, 1, jnp.float32)
    for pos, tok in enumerate([3, 17, 42]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(model.cfg, model.weights,
                                       jnp.array([[tok]], jnp.int32), cache, pos,
                                       impl="pallas", last_logit_only=True)
        np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=5e-3, atol=5e-3)


def make_q4(o, i, seed=0, pack4=True):
    from llamatpu.models.weights import prepare_qtensor

    rng = np.random.default_rng(seed)
    qs = rng.integers(-8, 8, (o, i), dtype=np.int8)
    scales = (rng.random((o, i // 32)).astype(np.float32) * 0.02 + 0.001)
    return prepare_qtensor(QTensor(qs, scales, "q4_0"), pack4=pack4)


def test_pack4_roundtrip():
    wp = make_q4(64, 96, seed=3)
    wi = make_q4(64, 96, seed=3, pack4=False)
    # rows lane-pad 64 -> 128; columns pack 96 -> 48
    assert wp.layout == "packed4" and wp.qs.shape == (128, 48)
    np.testing.assert_array_equal(np.asarray(wp.dequant()), np.asarray(wi.dequant()))
    np.testing.assert_array_equal(np.asarray(wp.canonical_qs()),
                                  np.asarray(wi.canonical_qs()))


@pytest.mark.parametrize("o,i,t", [(64, 64, 1), (128, 256, 1), (256, 1408, 5)])
def test_packed4_matches_dequant_reference(o, i, t):
    w = make_q4(o, i, seed=o + i)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((t, i)), jnp.float32)
    y = quant_matmul_pallas(w, x, interpret=True)
    ref = x @ w.dequant(jnp.float32).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_engine_pack4_matches_unpacked(tmp_path):
    """Full forward with packed4 Q4_0 weights == same checkpoint unpacked."""
    import tiny_models
    from llamatpu.gguf import GGMLType
    from llamatpu.models import loader as mloader
    from llamatpu.models.transformer import forward_tokens, init_cache

    path = tmp_path / "m4.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.Q4_0, seed=9)
    toks = jnp.array([[3, 17, 42]], jnp.int32)
    outs = []
    for pack4 in (False, True):
        model = mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                                   load_tokenizer=False, pack4=pack4)
        cache = init_cache(model.cfg, 1, jnp.float32)
        logits, _ = forward_tokens(model.cfg, model.weights, toks, cache, 0,
                                   impl="pallas", last_logit_only=True)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- q8_row


def make_rowq(o, i, seed=0, stacked=0):
    from llamatpu.models.weights import prepare_qtensor, rowq_requant

    rng = np.random.default_rng(seed)
    shape = (stacked, o, i) if stacked else (o, i)
    qs = rng.integers(-127, 128, shape, dtype=np.int8)
    scales = (rng.random((*shape[:-1], i // 32)).astype(np.float32) * 0.02 + 0.001)
    return rowq_requant(prepare_qtensor(QTensor(qs, scales, "q8_0")))


def test_rowq_requant_reconstruction():
    """Requant error is bounded by half the row scale, elementwise."""
    from llamatpu.models.weights import rowq_requant

    rng = np.random.default_rng(5)
    qs = rng.integers(-127, 128, (64, 128), dtype=np.int8)
    scales = (rng.random((64, 128 // 32)).astype(np.float32) * 0.02 + 0.001)
    w = QTensor(qs, scales, "q8_0")
    v = np.asarray(w.dequant(jnp.float32))
    wr = rowq_requant(w)
    assert wr.kind == "q8_row" and wr.scales.shape == (64, 1)
    vr = np.asarray(wr.dequant(jnp.float32))
    bound = np.asarray(wr.scales) * 0.5 + 1e-9
    assert np.all(np.abs(v - vr) <= bound + 1e-7)
    # interleaved input produces the identical result (canonical semantics)
    from llamatpu.models.weights import prepare_qtensor

    wr2 = rowq_requant(prepare_qtensor(w))  # lane-pads rows 64 -> 128
    np.testing.assert_array_equal(np.asarray(wr.qs), np.asarray(wr2.qs)[:64])


@pytest.mark.parametrize("o,i,t", [(64, 64, 1), (128, 256, 1), (256, 128, 7)])
def test_rowq_kernel_matches_dequant(o, i, t):
    w = make_rowq(o, i, seed=o + i)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((t, i)), jnp.float32)
    y = quant_matmul_pallas(w, x, interpret=True)
    ref = x @ w.dequant(jnp.float32).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rowq_stacked_kernel_matches_dequant():
    w = make_rowq(128, 64, seed=11, stacked=3)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64)), jnp.float32)
    for li in range(3):
        y = quant_matmul_pallas(w, x, interpret=True, li=jnp.int32(li))
        wl = QTensor(w.qs[li], w.scales[li], "q8_row")
        ref = x @ wl.dequant(jnp.float32).T
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rowq_int8_mxu_path():
    """T >= INT8_MXU_MIN_T routes to the int8 MXU dot; error is bounded by the
    per-token activation quantization (~1/254 relative of the row amax)."""
    from llamatpu.ops import int8_prefill

    o, i, t = 128, 256, int8_prefill.INT8_MXU_MIN_T
    w = make_rowq(o, i, seed=3)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((t, i)), jnp.float32)
    y = np.asarray(quant_matmul_pallas(w, x, interpret=True))
    ref = np.asarray(x @ w.dequant(jnp.float32).T)
    # activation quant: |dx| <= amax/254 per element -> dot error <= i * |w|max * amax/254
    denom = np.maximum(np.abs(ref), np.mean(np.abs(ref)))
    assert np.max(np.abs(y - ref) / denom) < 0.15
    # and it is NOT the exact dequant result (the int8 path really ran)
    assert not np.allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_rowq_stacked_int8_mxu_path():
    from llamatpu.ops import int8_prefill

    w = make_rowq(64, 256, seed=7, stacked=2)
    t = int8_prefill.INT8_MXU_MIN_T
    x = jnp.asarray(np.random.default_rng(8).standard_normal((t, 256)), jnp.float32)
    for li in range(2):
        y = np.asarray(quant_matmul_pallas(w, x, interpret=True, li=jnp.int32(li)))
        wl = QTensor(w.qs[li], w.scales[li], "q8_row")
        ref = np.asarray(x @ wl.dequant(jnp.float32).T)
        denom = np.maximum(np.abs(ref), np.mean(np.abs(ref)))
        assert np.max(np.abs(y - ref) / denom) < 0.15


def test_engine_rowq_forward_close_to_q8_0(tmp_path):
    """Full tiny-llama forward with --rowq weights stays close to the Q8_0
    forward (requant error only; same checkpoint)."""
    import tiny_models
    from llamatpu.gguf import GGMLType
    from llamatpu.models import loader as mloader
    from llamatpu.models.loader import LoadedModel
    from llamatpu.models.weights import rowq_convert_weights
    from llamatpu.models.transformer import forward_tokens, init_cache

    path = tmp_path / "mr.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.Q8_0, seed=6)
    model = mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    toks = jnp.array([[3, 17, 42]], jnp.int32)
    outs = {}
    for rowq in (False, True):
        w = rowq_convert_weights(model.weights) if rowq else model.weights
        cache = init_cache(model.cfg, 1, jnp.float32)
        logits, _ = forward_tokens(model.cfg, w, toks, cache, 0,
                                   impl="pallas", last_logit_only=True)
        outs[rowq] = np.asarray(logits)
    scale = np.std(outs[False]) + 1e-9
    assert np.max(np.abs(outs[True] - outs[False])) / scale < 0.2


def test_ffn_fused_rowq_matches_two_call():
    """FFN megakernel (one pallas call) == unfused rowq path (w13 -> silu ->
    w2) within f32/bf16 rounding."""
    from llamatpu.ops.ffn_fused import ffn_fused_rowq

    d, f, L = 256, 512, 3
    w13 = make_rowq(2 * f, d, seed=21, stacked=L)
    w2 = make_rowq(d, f, seed=22, stacked=L)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 1, d)) * 0.1,
                    jnp.float32)
    for li in range(L):
        y = ffn_fused_rowq(w13, w2, x, jnp.int32(li), interpret=True)
        assert y is not None
        w13l = QTensor(w13.qs[li], w13.scales[li], "q8_row")
        w2l = QTensor(w2.qs[li], w2.scales[li], "q8_row")
        g13 = x @ w13l.dequant(jnp.float32).T
        gate, up = g13[..., :f], g13[..., f:]
        act = jax.nn.silu(gate) * up
        ref = act @ w2l.dequant(jnp.float32).T
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-2, atol=2e-3)


def test_ffn_fused_rowq_batched_and_fallbacks():
    from llamatpu.ops.ffn_fused import ffn_fused_rowq, _MAX_T

    d, f, L = 256, 512, 2
    w13 = make_rowq(2 * f, d, seed=31, stacked=L)
    w2 = make_rowq(d, f, seed=32, stacked=L)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((4, 1, d)) * 0.1,
                    jnp.float32)
    y = ffn_fused_rowq(w13, w2, x, jnp.int32(1), interpret=True)
    assert y is not None and y.shape == (4, 1, d)
    # too-wide T falls back (prefill path)
    xw = jnp.zeros((_MAX_T + 1, 1, d), jnp.float32)
    assert ffn_fused_rowq(w13, w2, xw, jnp.int32(0), interpret=True) is None
    # non-rowq tensors fall back
    from llamatpu.models.weights import prepare_qtensor

    rng = np.random.default_rng(33)
    q8 = prepare_qtensor(QTensor(
        rng.integers(-127, 128, (L, 2 * f, d), dtype=np.int8),
        rng.random((L, 2 * f, d // 32)).astype(np.float32) * 0.01, "q8_0"))
    assert ffn_fused_rowq(q8, w2, x, jnp.int32(0), interpret=True) is None


def test_engine_rowq_fused_forward_matches_unfused(tmp_path):
    """Decode forward through the megakernel (T=1, stacked q8_row) matches
    the same weights through the two-call rowq path."""
    import tiny_models
    from llamatpu.gguf import GGMLType
    from llamatpu.models import loader as mloader
    from llamatpu.models.weights import rowq_convert_weights, fuse_layer_weights
    from llamatpu.models.transformer import forward_tokens, init_cache
    from llamatpu.ops import ffn_fused

    path = tmp_path / "mf.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.Q8_0, seed=13)
    model = mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    w = rowq_convert_weights(fuse_layer_weights(model.cfg, model.weights))
    toks = jnp.array([[3, 17, 42]], jnp.int32)
    outs = {}
    for fused in (True, False):
        saved = ffn_fused._MAX_T
        if not fused:
            ffn_fused._MAX_T = 0  # force the two-call path
        try:
            cache = init_cache(model.cfg, 1, jnp.float32)
            logits = None
            for pos in range(3):
                logits, cache = forward_tokens(
                    model.cfg, w, toks[:, pos:pos + 1], cache, pos,
                    impl="pallas", last_logit_only=True)
            outs[fused] = np.asarray(logits)
        finally:
            ffn_fused._MAX_T = saved
    np.testing.assert_allclose(outs[True], outs[False], rtol=5e-3, atol=5e-3)
