"""Layer megakernel v2 (ops/layer_fused.py): the fused wo+residual+rmsnorm+
w13+silu+w2+residual call and the norm-fused wqkv call must match the unfused
op chain on identical q8_row weights, including the Granite residual-scale
variant, and the full forward must use them transparently."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llamatpu.models.weights import QTensor, prepare_qtensor, rowq_requant
from llamatpu.ops.layer_fused import layer_tail_fused_rowq, qkv_norm_fused_rowq
from llamatpu.ops.rmsnorm import rmsnorm

L, D, F, H = 2, 128, 128, 128  # dims multiples of 128: megakernel-eligible
EPS = 1e-5


def _rowq(o, i, seed):
    rng = np.random.default_rng(seed)
    qs = rng.integers(-127, 128, size=(L, o, i), dtype=np.int8)
    scales = (rng.random((L, o, i // 32), dtype=np.float32) * 0.01 + 0.005)
    return rowq_requant(prepare_qtensor(QTensor(qs, scales, "q8_0")))


@pytest.fixture(scope="module")
def ws():
    return {
        "wo": _rowq(D, H, 1),
        "w13": _rowq(2 * F, D, 2),
        "w2": _rowq(D, F, 3),
        "wqkv": _rowq(256, D, 4),
        "ffn_norm": np.random.default_rng(5).normal(size=(L, D)).astype(np.float32),
        "attn_norm": np.random.default_rng(6).normal(size=(L, D)).astype(np.float32),
    }


def _deq(w, li):
    return np.asarray(w.qs[li], np.float32) * np.asarray(w.scales[li], np.float32)


def _tail_ref(ws, attn, x, li, rs=1.0):
    """Numpy reference of the unfused chain (f32 residual stream — the
    kernel keeps x2 in f32 scratch)."""
    wo, w13, w2 = _deq(ws["wo"], li), _deq(ws["w13"], li), _deq(ws["w2"], li)
    x2 = x.astype(np.float32) + rs * (attn.astype(np.float32) @ wo.T)
    ss = np.mean(x2 * x2, axis=-1, keepdims=True) + EPS
    h = x2 / np.sqrt(ss) * ws["ffn_norm"][li][None, :]
    g13 = h @ w13.T
    gate, up = g13[:, :F], g13[:, F:]
    act = gate / (1 + np.exp(-gate)) * up
    return x2 + rs * (act @ w2.T)


@pytest.mark.parametrize("t,rs", [(1, 1.0), (5, 1.0), (8, 0.5)])
def test_tail_matches_unfused_chain(ws, t, rs):
    rng = np.random.default_rng(t)
    attn = rng.normal(size=(t, H)).astype(np.float32) * 0.1
    x = rng.normal(size=(t, D)).astype(np.float32) * 0.1
    for li in range(L):
        got = layer_tail_fused_rowq(
            ws["wo"], ws["w13"], ws["w2"], jnp.asarray(ws["ffn_norm"]),
            jnp.asarray(attn), jnp.asarray(x), jnp.int32(li), EPS, rs,
            interpret=True)
        assert got is not None
        want = _tail_ref(ws, attn, x, li, rs)
        # f32 dot accumulation order differs between the kernel and numpy
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=1e-3)


def test_qkv_norm_fused_matches_chain(ws):
    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, 3, D)).astype(np.float32) * 0.2
    for li in range(L):
        got = qkv_norm_fused_rowq(ws["wqkv"], jnp.asarray(ws["attn_norm"]),
                                  jnp.asarray(x), jnp.int32(li), EPS,
                                  interpret=True)
        assert got is not None
        h = rmsnorm(jnp.asarray(x), jnp.asarray(ws["attn_norm"][li]), EPS)
        want = np.asarray(h.reshape(3, D), np.float32) @ _deq(ws["wqkv"], li).T
        np.testing.assert_allclose(np.asarray(got).reshape(3, 256), want,
                                   rtol=5e-4, atol=1e-3)


def test_ineligible_shapes_fall_back(ws):
    # T too large
    x = jnp.zeros((64, D), jnp.float32)
    attn = jnp.zeros((64, H), jnp.float32)
    assert layer_tail_fused_rowq(ws["wo"], ws["w13"], ws["w2"],
                                 jnp.asarray(ws["ffn_norm"]), attn, x,
                                 jnp.int32(0), EPS, interpret=True) is None
    # non-rowq weights
    rng = np.random.default_rng(0)
    qs = rng.integers(-127, 128, size=(L, D, H), dtype=np.int8)
    sc = np.ones((L, D, H // 32), np.float32)
    blockq = QTensor(qs, sc, "q8_0")
    assert layer_tail_fused_rowq(blockq, ws["w13"], ws["w2"],
                                 jnp.asarray(ws["ffn_norm"]),
                                 jnp.zeros((1, H)), jnp.zeros((1, D)),
                                 jnp.int32(0), EPS, interpret=True) is None


def test_forward_uses_megakernel_and_matches_xla():
    """Full eligible-geometry forward: pallas (megakernel path) vs xla dequant
    on identical q8_row weights."""
    from llamatpu.models.config import Family, ModelConfig
    from llamatpu.models.transformer import forward_tokens, init_cache
    from llamatpu.models.weights import (fuse_layer_weights,
                                         rowq_convert_weights)
    from llamatpu.ops.rope import precompute_rope_tables

    # n_kv_heads=4 so kv_dim=128: prepare_qtensor row-padding would set
    # logical_out on a 64-row wk and block the qkv fusion
    cfg = ModelConfig(family=Family.LLAMA_3, dim=D, hidden_dim=F, n_layers=L,
                      n_heads=4, n_kv_heads=4, vocab_size=256,
                      context_length=32, head_dim=32)
    rng = np.random.default_rng(13)

    def q(o, i, seed):
        qs = rng.integers(-127, 128, size=(L, o, i), dtype=np.int8)
        sc = rng.random((L, o, i // 32), dtype=np.float32) * 0.01 + 0.005
        return prepare_qtensor(QTensor(qs, sc, "q8_0"))

    layers = {
        "attn_norm": np.ones((L, D), np.float32),
        "ffn_norm": np.ones((L, D), np.float32),
        "wq": q(cfg.q_dim, D, 1), "wk": q(cfg.kv_dim, D, 2),
        "wv": q(cfg.v_dim, D, 3), "wo": q(D, cfg.q_dim, 4),
        "w1": q(F, D, 5), "w2": q(D, F, 6), "w3": q(F, D, 7),
    }
    cos, sin = precompute_rope_tables(cfg)
    wcls_qs = rng.integers(-127, 128, size=(256, D), dtype=np.int8)
    wcls_sc = rng.random((256, D // 32), dtype=np.float32) * 0.01
    weights = {
        "tok_emb": rng.normal(size=(256, D)).astype(np.float32) * 0.02,
        "final_norm": np.ones((D,), np.float32),
        "wcls": prepare_qtensor(QTensor(wcls_qs, wcls_sc, "q8_0")),
        "rope_cos": cos, "rope_sin": sin, "layers": layers,
    }
    w = rowq_convert_weights(fuse_layer_weights(cfg, weights))
    assert w["layers"]["wqkv"].kind == "q8_row"  # fused + converted: eligible
    toks = jnp.array([[3, 17, 42, 9]], jnp.int32)
    outs = {}
    for impl in ("xla", "pallas"):
        cache = init_cache(cfg, 1, jnp.float32)
        logits, cache = forward_tokens(cfg, w, toks, cache, 0, impl=impl,
                                       last_logit_only=True)
        # decode step exercises the T=1 megakernel path
        logits2, _ = forward_tokens(cfg, w, jnp.array([[7]], jnp.int32),
                                    cache, 4, impl=impl, last_logit_only=True)
        outs[impl] = (np.asarray(logits[0]), np.asarray(logits2[0]))
    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(outs["pallas"][1], outs["xla"][1],
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("t,rs", [(1, 1.0), (5, 0.5)])
def test_tail_ktile_variant_matches_chain(ws, t, rs):
    """Variant B (w2 contraction-tiled [D, tf] blocks, partials in scratch)
    must match the same reference chain."""
    import llamatpu.ops.layer_fused as lf

    rng = np.random.default_rng(t + 100)
    attn = rng.normal(size=(t, H)).astype(np.float32) * 0.1
    x = rng.normal(size=(t, D)).astype(np.float32) * 0.1
    saved = lf._W2_KTILE
    lf._W2_KTILE = True
    try:
        for li in range(L):
            got = lf.layer_tail_fused_rowq(
                ws["wo"], ws["w13"], ws["w2"], jnp.asarray(ws["ffn_norm"]),
                jnp.asarray(attn), jnp.asarray(x), jnp.int32(li), EPS, rs,
                interpret=True)
            assert got is not None
            want = _tail_ref(ws, attn, x, li, rs)
            np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4,
                                       atol=1e-3)
    finally:
        lf._W2_KTILE = saved


def test_attn_tail_mega_matches_composition():
    """Megakernel v3 (layer_attn_tail_fused_rowq): one call == fused-write
    attention + the v2 tail, across tile-boundary positions. The attention
    phase is split-kernel online softmax, so the comparison oracle is the
    SPLIT attention + tail composition (bit-exact); vs the full-stripe
    kernel the diff is the documented online-softmax f32 rounding class."""
    from llamatpu.ops.layer_fused import layer_attn_tail_fused_rowq
    from llamatpu.ops.pallas_attention import (decode_attention_fused_write,
                                               decode_attention_split)

    rng = np.random.default_rng(1)
    Lm, KV, G, hd, S = 2, 4, 2, 64, 768  # s_tile=256 -> 3 attention tiles
    d = KV * G * hd
    f = 1024
    o13 = 2 * f

    def rowq(o, i):
        qs = rng.integers(-127, 128, (Lm, o, i)).astype(np.int8)
        sc = (rng.random((Lm, o, 1)).astype(np.float32) + 0.5) / 127
        return QTensor(jnp.asarray(qs), jnp.asarray(sc), "q8_row", None, None)

    wo, w13, w2 = rowq(d, d), rowq(o13, d), rowq(d, f)
    nw = jnp.asarray(rng.normal(0, 0.1, (Lm, d)).astype(np.float32) + 1.0)
    for p in (0, 31, 255, 256, 700, S - 1):
        kvc = jnp.asarray(rng.normal(size=(Lm, 1, KV, S, 2 * hd)), jnp.bfloat16)
        q4 = jnp.asarray(rng.normal(size=(1, KV, G, hd)), jnp.bfloat16)
        kvn = jnp.asarray(rng.normal(size=(1, KV, 2 * hd)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(1, 1, d)), jnp.bfloat16)
        pos = jnp.asarray([p], jnp.int32)
        li = 1
        _, kvc2 = decode_attention_fused_write(
            q4, kvn, kvc, pos, 0.125, li, hd=hd, interpret=True)
        attn = decode_attention_split(q4, kvc2, pos, 0.125, hd=hd, s_tile=256,
                                      interpret=True, layer_index=li)
        ref = layer_tail_fused_rowq(
            wo, w13, w2, nw, attn.reshape(1, 1, d).astype(x.dtype), x, li,
            EPS, 1.0, interpret=True)
        out = layer_attn_tail_fused_rowq(
            wo, w13, w2, nw, q4, kvn, kvc, x, pos, li, EPS, 0.125, hd, 1.0,
            interpret=True)
        assert out is not None
        y, kvc3 = out
        assert jnp.array_equal(kvc3, kvc2)
        np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                      np.asarray(y, np.float32))
