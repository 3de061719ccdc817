"""Pallas decode attention vs the einsum reference (interpret mode on CPU).

All kernels read the PACKED cache layout ([..., S, hd+vhd], K in lanes
[0:hd], V in [hd:] — see ops/pallas_attention.py docstring); tests build the
packed arrays with `_pack` and compare against the separate-K/V einsum
reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from llamatpu.models.config import Family, ModelConfig
from llamatpu.models.transformer import _attention
from llamatpu.ops.pallas_attention import decode_attention, decode_attention_split


def _pack(kc, vc):
    return jnp.concatenate([kc, vc], axis=-1)


@pytest.mark.parametrize("b,kv,g,hd,s", [(1, 2, 4, 16, 32), (3, 4, 2, 32, 64), (2, 1, 8, 64, 16)])
def test_matches_einsum_reference(b, kv, g, hd, s):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    scale = 1.0 / np.sqrt(hd)
    got = decode_attention(q, _pack(kc, vc), pos, scale, hd=hd, interpret=True)

    cfg = ModelConfig(family=Family.LLAMA_3, dim=kv * g * hd, hidden_dim=4,
                      n_layers=1, n_heads=kv * g, n_kv_heads=kv,
                      vocab_size=8, context_length=s, head_dim=hd)
    want = _attention(cfg, q.reshape(b, 1, kv, g, hd), kc, vc, pos, 1)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,kv,g,hd,s,tile", [
    (1, 2, 4, 16, 64, 16),   # multi-tile, pos anywhere
    (2, 1, 8, 32, 128, 32),
    (1, 1, 4, 16, 64, 64),   # single tile == full kernel degenerate case
])
def test_split_matches_full(b, kv, g, hd, s, tile):
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), jnp.float32)
    kvc = jnp.asarray(rng.standard_normal((b, kv, s, 2 * hd)), jnp.float32)
    scale = 1.0 / np.sqrt(hd)
    # exercise pos in the first tile, mid-tile, tile boundary, and last slot
    for pos_list in ([0] * b, [tile - 1] * b, [tile] * b, [s - 1] * b,
                     list(rng.integers(0, s, b))):
        pos = jnp.asarray(pos_list, jnp.int32)
        want = decode_attention(q, kvc, pos, scale, hd=hd, interpret=True)
        got = decode_attention_split(q, kvc, pos, scale, hd=hd, s_tile=tile,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_split_per_batch_positions_differ():
    """Clamped KV index maps are per-batch: lanes at very different positions
    in the same call must each be exact."""
    rng = np.random.default_rng(11)
    b, kv, g, hd, s, tile = 4, 2, 2, 16, 128, 32
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), jnp.float32)
    kvc = jnp.asarray(rng.standard_normal((b, kv, s, 2 * hd)), jnp.float32)
    pos = jnp.asarray([0, 31, 96, 127], jnp.int32)
    scale = 1.0 / np.sqrt(hd)
    want = decode_attention(q, kvc, pos, scale, hd=hd, interpret=True)
    got = decode_attention_split(q, kvc, pos, scale, hd=hd, s_tile=tile,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_engine_pallas_attention_matches_oracle(tmp_path):
    import tiny_models
    from oracle import Oracle
    from llamatpu.gguf import GGMLType, GGUFReader
    from llamatpu.models import loader as mloader
    from llamatpu.models.transformer import forward_tokens, init_cache

    path = tmp_path / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.Q8_0, seed=6)
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


def test_paged_attention_matches_dense_gather():
    """Block-table DMA kernel == dense attention over the gathered lane view
    (f32 and int8), random tables, per-lane positions."""
    import numpy as np
    from llamatpu.ops.pallas_attention import decode_attention, decode_attention_paged
    from llamatpu.runtime.paged_cache import paged_gather

    rng = np.random.default_rng(5)
    B, KV, G, HD, BS, NBLK, MAXBLK = 2, 2, 4, 32, 16, 12, 4
    q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
    kv_pool = jnp.asarray(rng.standard_normal((NBLK, KV, BS, 2 * HD)),
                          jnp.float32)
    # distinct random tables per lane; positions mid-block and at block edge
    tables = jnp.asarray([[3, 7, 1, 9], [5, 0, 8, 2]], jnp.int32)
    pos = jnp.asarray([37, 31], jnp.int32)

    got = decode_attention_paged(q, kv_pool, tables, pos, 0.25, hd=HD,
                                 interpret=True)
    kvd = paged_gather(kv_pool, tables)
    ref = decode_attention(q, kvd, pos, 0.25, hd=HD, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_paged_attention_int8_matches_dense_gather():
    import numpy as np
    from llamatpu.ops.kv_quant import quantize_kv
    from llamatpu.ops.pallas_attention import decode_attention_paged, decode_attention_q
    from llamatpu.runtime.paged_cache import paged_gather, paged_gather_scale

    rng = np.random.default_rng(6)
    B, KV, G, HD, BS, NBLK = 2, 2, 2, 32, 16, 10
    q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
    kf = rng.standard_normal((NBLK, KV, BS, HD)).astype(np.float32)
    vf = rng.standard_normal((NBLK, KV, BS, HD)).astype(np.float32)
    kq, ks = quantize_kv(jnp.asarray(kf))  # per (block, head, pos)
    vq, vs = quantize_kv(jnp.asarray(vf))
    kv_pool = jnp.concatenate([kq, vq], axis=-1)        # [NBLK, KV, BS, 2HD]
    s_pool = jnp.stack([ks, vs], axis=2)                # [NBLK, KV, 2, BS]
    tables = jnp.asarray([[4, 1, 6], [2, 9, 0]], jnp.int32)
    pos = jnp.asarray([40, 17], jnp.int32)

    got = decode_attention_paged(q, kv_pool, tables, pos, 0.2,
                                 scale_pool=s_pool, hd=HD, interpret=True)
    ref = decode_attention_q(q, paged_gather(kv_pool, tables),
                             paged_gather_scale(s_pool, tables),
                             pos, 0.2, hd=HD, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_multi_head_per_program_matches_hpp1():
    """hpp>1 (MHA grid batching) must equal the per-head grid exactly."""
    import numpy as np
    from llamatpu.ops.pallas_attention import decode_attention

    rng = np.random.default_rng(9)
    B, KV, G, HD, S = 2, 8, 1, 32, 64
    q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
    kvc = jnp.asarray(rng.standard_normal((B, KV, S, 2 * HD)), jnp.float32)
    pos = jnp.asarray([33, 64 - 1], jnp.int32)
    a = decode_attention(q, kvc, pos, 0.3, hd=HD, interpret=True, hpp=1)
    b4 = decode_attention(q, kvc, pos, 0.3, hd=HD, interpret=True, hpp=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b4))


def test_multi_head_per_program_int8_matches_hpp1():
    import numpy as np
    from llamatpu.ops.kv_quant import quantize_kv
    from llamatpu.ops.pallas_attention import decode_attention_q

    rng = np.random.default_rng(10)
    B, KV, G, HD, S = 1, 4, 2, 32, 48
    q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((B, KV, S, HD)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((B, KV, S, HD)), jnp.float32)
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    kvc = jnp.concatenate([kq, vq], axis=-1)
    sc = jnp.stack([ks, vs], axis=2)  # [B, KV, 2, S]
    pos = jnp.asarray([29], jnp.int32)
    a = decode_attention_q(q, kvc, sc, pos, 0.3, hd=HD, interpret=True, hpp=1)
    b2 = decode_attention_q(q, kvc, sc, pos, 0.3, hd=HD, interpret=True, hpp=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_fused_write_matches_write_then_attend():
    """decode_attention_fused_write (megakernel v3 step 1): appending this
    token's packed K/V row inside the attention kernel must be BIT-identical
    to the unfused write-then-attend path (same cast, same dot operands), and
    the aliased cache output must equal a dynamic_update_slice write — for
    both cache dtypes and at tile-boundary positions."""
    import numpy as np
    from llamatpu.ops.pallas_attention import (decode_attention,
                                               decode_attention_fused_write)

    rng = np.random.default_rng(11)
    L, B, KV, G, S, HD = 3, 2, 4, 2, 96, 64
    for dtype in (jnp.float32, jnp.bfloat16):
        for pos_list in ([5, 37], [31, 32], [0, S - 1]):
            kvc = jnp.asarray(rng.standard_normal((L, B, KV, S, 2 * HD)), dtype)
            q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
            kvn = jnp.asarray(rng.standard_normal((B, KV, 2 * HD)), jnp.float32)
            pos = jnp.asarray(pos_list, jnp.int32)
            li = 1
            kvc2 = kvc
            for b in range(B):
                kvc2 = kvc2.at[li, b, :, pos[b]].set(kvn[b].astype(dtype))
            ref = decode_attention(q, kvc2, pos, 0.125, hd=HD, interpret=True,
                                   layer_index=li)
            out, kvc3 = decode_attention_fused_write(
                q, kvn, kvc, pos, 0.125, li, hd=HD, interpret=True)
            assert jnp.array_equal(kvc3, kvc2)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_fused_write_q_matches_write_then_attend():
    """Int8-KV fused append+attend == quantize -> dynamic_update_slice ->
    decode_attention_q, bit-for-bit (same quantization outside the kernel,
    same fold semantics inside)."""
    import numpy as np
    from llamatpu.ops.kv_quant import quantize_kv
    from llamatpu.ops.pallas_attention import (decode_attention_fused_write_q,
                                               decode_attention_q)

    rng = np.random.default_rng(12)
    L, B, KV, G, S, HD = 2, 2, 4, 2, 96, 64
    for pos_list in ([5, 37], [31, 32], [0, S - 1]):
        kvc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, S, 2 * HD)),
                          jnp.int8)
        sc = jnp.asarray(rng.random((L, B, KV, 2, S)), jnp.float32) * 0.02
        q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, HD)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, HD)), jnp.float32)
        kq, ks = quantize_kv(kn)
        vq, vs = quantize_kv(vn)
        kvq = jnp.concatenate([kq, vq], axis=-1)
        s_new = jnp.stack([ks, vs], axis=-1)  # [B, KV, 2]
        pos = jnp.asarray(pos_list, jnp.int32)
        li = 1
        kvc2, sc2 = kvc, sc
        for b in range(B):
            kvc2 = kvc2.at[li, b, :, pos[b]].set(kvq[b])
            sc2 = sc2.at[li, b, :, 0, pos[b]].set(ks[b])
            sc2 = sc2.at[li, b, :, 1, pos[b]].set(vs[b])
        ref = decode_attention_q(q, kvc2, sc2, pos, 0.125, hd=HD,
                                 interpret=True, layer_index=li)
        out, kvc3, sc3 = decode_attention_fused_write_q(
            q, kvq, s_new, kvc, sc, pos, 0.125, li, hd=HD, interpret=True)
        assert jnp.array_equal(kvc3, kvc2)
        assert jnp.array_equal(sc3, sc2)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_split_fused_write_matches_write_then_attend():
    """decode_attention_split_fused_write (long-context append fusion):
    appending inside the splitKV kernel must be BIT-identical to dus-write ->
    decode_attention_split (same tile walk, same operands), and the aliased
    cache output must equal the dus write — across cache dtypes, positions
    at tile boundaries / write-tile boundaries / first / last slot."""
    import numpy as np
    from llamatpu.ops.pallas_attention import (
        decode_attention_split, decode_attention_split_fused_write)

    rng = np.random.default_rng(13)
    L, B, KV, G, S, HD, TILE = 3, 2, 2, 2, 256, 64, 64
    for dtype in (jnp.float32, jnp.bfloat16):
        for pos_list in ([5, 37], [63, 64], [31, 32], [0, S - 1], [200, 130]):
            kvc = jnp.asarray(rng.standard_normal((L, B, KV, S, 2 * HD)), dtype)
            q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
            kvn = jnp.asarray(rng.standard_normal((B, KV, 2 * HD)), jnp.float32)
            pos = jnp.asarray(pos_list, jnp.int32)
            li = 2
            kvc2 = kvc
            for b in range(B):
                kvc2 = kvc2.at[li, b, :, pos[b]].set(kvn[b].astype(dtype))
            ref = decode_attention_split(q, kvc2, pos, 0.125, hd=HD,
                                         s_tile=TILE, interpret=True,
                                         layer_index=li)
            out, kvc3 = decode_attention_split_fused_write(
                q, kvn, kvc, pos, 0.125, li, hd=HD, s_tile=TILE,
                interpret=True)
            assert jnp.array_equal(kvc3, kvc2)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_split_fused_write_q_matches_write_then_attend():
    """Int8-KV split fused append == quantize -> dus -> split attention,
    bit-for-bit; the aliased int8 tiles AND scale rows must match the dus
    writes (scale tiles are rewritten per visited tile — untouched tiles past
    the clamp must survive)."""
    import numpy as np
    from llamatpu.ops.kv_quant import quantize_kv
    from llamatpu.ops.pallas_attention import (
        decode_attention_split_fused_write_q, decode_attention_split_q)

    rng = np.random.default_rng(14)
    L, B, KV, G, S, HD, TILE = 2, 2, 2, 2, 256, 64, 64
    for pos_list in ([5, 37], [63, 64], [0, S - 1], [200, 130]):
        kvc = jnp.asarray(rng.integers(-127, 128, (L, B, KV, S, 2 * HD)),
                          jnp.int8)
        sc = jnp.asarray(rng.random((L, B, KV, 2, S)), jnp.float32) * 0.02
        q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, KV, HD)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, KV, HD)), jnp.float32)
        kq, ks = quantize_kv(kn)
        vq, vs = quantize_kv(vn)
        kvq = jnp.concatenate([kq, vq], axis=-1)
        s_new = jnp.stack([ks, vs], axis=-1)
        pos = jnp.asarray(pos_list, jnp.int32)
        li = 1
        kvc2, sc2 = kvc, sc
        for b in range(B):
            kvc2 = kvc2.at[li, b, :, pos[b]].set(kvq[b])
            sc2 = sc2.at[li, b, :, 0, pos[b]].set(ks[b])
            sc2 = sc2.at[li, b, :, 1, pos[b]].set(vs[b])
        ref = decode_attention_split_q(q, kvc2, sc2, pos, 0.125, hd=HD,
                                       s_tile=TILE, interpret=True,
                                       layer_index=li)
        out, kvc3, sc3 = decode_attention_split_fused_write_q(
            q, kvq, s_new, kvc, sc, pos, 0.125, li, hd=HD, s_tile=TILE,
            interpret=True)
        assert jnp.array_equal(kvc3, kvc2)
        assert jnp.array_equal(sc3, sc2)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_split_stats_cross_shard_combine():
    """decode_attention_split_stats partial-softmax combine: two half-stripe
    shards combined with exp(m - max m) * l weights must equal full-stripe
    attention (the sp-inside-pp math, models/transformer + parallel/pipeline)."""
    import numpy as np
    from llamatpu.ops.pallas_attention import (decode_attention,
                                               decode_attention_split_stats)

    rng = np.random.default_rng(21)
    B, KV, G, HD, S = 2, 2, 2, 32, 256
    q = jnp.asarray(rng.standard_normal((B, KV, G, HD)), jnp.float32)
    kvc = jnp.asarray(rng.standard_normal((B, KV, S, 2 * HD)), jnp.float32)
    for pos_list in ([10, 100], [127, 128], [200, 255], [5, 60]):
        pos = jnp.asarray(pos_list, jnp.int32)
        want = decode_attention(q, kvc, pos, 0.2, hd=HD, interpret=True)
        halves = [kvc[:, :, :128], kvc[:, :, 128:]]
        outs = []
        for sh, kv_loc in enumerate(halves):
            off = sh * 128
            pos_k = jnp.clip(pos - off, 0, 127)
            o, m, l = decode_attention_split_stats(
                q, kv_loc, pos_k, 0.2, hd=HD, s_tile=64, interpret=True)
            valid = ((pos - off) >= 0)[:, None, None, None]
            m = jnp.where(valid, m, -1e30)
            outs.append((o, m, l, valid))
        m_g = jnp.maximum(outs[0][1], outs[1][1])
        num = den = 0.0
        for o, m, l, valid in outs:
            w = jnp.where(valid, jnp.exp(m - m_g) * l, 0.0)
            num = num + w * o
            den = den + w
        got = num / jnp.maximum(den, 1e-38)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
