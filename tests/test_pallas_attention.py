"""Pallas decode attention vs the einsum reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from llamatpu.models.config import Family, ModelConfig
from llamatpu.models.transformer import _attention
from llamatpu.ops.pallas_attention import decode_attention, decode_attention_split


@pytest.mark.parametrize("b,kv,g,hd,s", [(1, 2, 4, 16, 32), (3, 4, 2, 32, 64), (2, 1, 8, 64, 16)])
def test_matches_einsum_reference(b, kv, g, hd, s):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    scale = 1.0 / np.sqrt(hd)
    got = decode_attention(q, kc, vc, pos, scale, interpret=True)

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
    kc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    scale = 1.0 / np.sqrt(hd)
    # exercise pos in the first tile, mid-tile, tile boundary, and last slot
    for pos_list in ([0] * b, [tile - 1] * b, [tile] * b, [s - 1] * b,
                     list(rng.integers(0, s, b))):
        pos = jnp.asarray(pos_list, jnp.int32)
        want = decode_attention(q, kc, vc, pos, scale, interpret=True)
        got = decode_attention_split(q, kc, vc, pos, scale, s_tile=tile,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_split_per_batch_positions_differ():
    """Clamped K/V index maps are per-batch: lanes at very different positions
    in the same call must each be exact."""
    rng = np.random.default_rng(11)
    b, kv, g, hd, s, tile = 4, 2, 2, 16, 128, 32
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, kv, s, hd)), jnp.float32)
    pos = jnp.asarray([0, 31, 96, 127], jnp.int32)
    scale = 1.0 / np.sqrt(hd)
    want = decode_attention(q, kc, vc, pos, scale, interpret=True)
    got = decode_attention_split(q, kc, vc, pos, scale, s_tile=tile,
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
