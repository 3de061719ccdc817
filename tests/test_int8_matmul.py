"""Exact int8 x int8 matmul vs a scalar reference of the reference's
dotQ8Activation semantics (Q8_0FloatTensor.java:90-121)."""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from llamatpu.gguf import quants
from llamatpu.models.weights import QTensor, quantize_array_q8_0
from llamatpu.ops.int8_matmul import quant_matmul_int8


def ref_dot_q8_activation(w_raw: np.ndarray, x: np.ndarray) -> float:
    """Scalar port of dotQ8Activation: per-32 blocks, full-precision-derived
    int8 activation, f16 stored scales, int32 accumulate."""
    n = x.size
    total = 0.0
    for b in range(n // 32):
        blk = w_raw[b * 34 : (b + 1) * 34]
        w_scale = float(np.frombuffer(bytes(blk[:2]), np.float16)[0])
        wq = np.frombuffer(bytes(blk[2:]), np.int8)
        xb = x[b * 32 : (b + 1) * 32].astype(np.float32)
        amax = float(np.abs(xb).max())
        d = amax / 127.0
        a_scale = float(np.float16(d))
        inv = 1.0 / d if d != 0 else 0.0
        s = xb * inv
        aq = np.trunc(s + np.copysign(0.5, s)).astype(np.int32)
        isum = int((aq * wq.astype(np.int32)).sum())
        total += isum * (w_scale * a_scale)
    return total


def test_matches_scalar_reference():
    rng = np.random.default_rng(5)
    o, i = 8, 96
    wf = rng.normal(size=(o, i)).astype(np.float32)
    w_raw = quants.quantize_q8_0(wf.reshape(-1)).reshape(o, -1)
    w = quantize_array_q8_0(wf)
    x = rng.normal(size=(1, i)).astype(np.float32)
    got = np.asarray(quant_matmul_int8(w, jnp.asarray(x)))
    want = np.array([[ref_dot_q8_activation(w_raw[r], x[0]) for r in range(o)]],
                    np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_multi_token_and_leading_dims():
    rng = np.random.default_rng(6)
    o, i = 16, 64
    wf = rng.normal(size=(o, i)).astype(np.float32)
    w_raw = quants.quantize_q8_0(wf.reshape(-1)).reshape(o, -1)
    w = quantize_array_q8_0(wf)
    x = rng.normal(size=(2, 3, i)).astype(np.float32)
    got = np.asarray(quant_matmul_int8(w, jnp.asarray(x)))
    for a in range(2):
        for b in range(3):
            want = [ref_dot_q8_activation(w_raw[r], x[a, b]) for r in range(o)]
            np.testing.assert_allclose(got[a, b], np.array(want), rtol=1e-6, atol=1e-6)


def test_engine_int8_impl_close_to_oracle(tmp_path):
    import tiny_models
    from oracle import Oracle
    from llamatpu.gguf import GGMLType, GGUFReader
    from llamatpu.models import loader as mloader
    from llamatpu.models.transformer import forward_tokens, init_cache

    path = tmp_path / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.Q8_0, seed=8)
    model = mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    with GGUFReader(str(path)) as r:
        deq = {n: r.tensor_f32(n) for n in r.tensor_infos}
    orc = Oracle(model.cfg, deq, "llama")
    cache = init_cache(model.cfg, 1, jnp.float32)
    for pos, tok in enumerate([3, 17]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(model.cfg, model.weights,
                                       jnp.array([[tok]], jnp.int32), cache, pos,
                                       impl="int8", last_logit_only=True)
        # int8-activation quantization adds ~1%-scale rounding at every
        # projection vs the float-dot oracle; compare absolutely (near-zero
        # logits make relative error meaningless)
        np.testing.assert_allclose(np.asarray(logits[0]), want, atol=0.06, rtol=0)
