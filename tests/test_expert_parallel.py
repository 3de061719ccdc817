"""Expert-parallel MoE (weights sharded whole-expert over tp): the shard_map
path must match the single-device scan numerics, and the EP engine must
generate the same greedy tokens as the unsharded engine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.parallel import make_mesh


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("ep") / "moe.gguf"
    tiny_models.build_tiny_gguf(path, family="qwen2moe", quant=GGMLType.Q8_0,
                                with_tokenizer=True, seed=13)
    return mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32)


@pytest.mark.parametrize("n_tokens", [1, 20])
def test_ep_matches_single_device(model, n_tokens):
    from llamatpu.models.transformer import _moe_ffn
    from llamatpu.parallel import shard_model

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device CPU mesh")
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    cfg = model.cfg
    lw = jax.tree.map(lambda a: a[0], model.weights["layers"])

    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.standard_normal((1, n_tokens, cfg.dim)) * 0.3, jnp.float32)
    want = _moe_ffn(cfg, h, lw, "xla")

    sharded = shard_model(model.weights, cfg, mesh, ep=True)
    lw_s = jax.tree.map(lambda a: a[0], sharded["layers"])
    with mesh:
        got = _moe_ffn(cfg, h, lw_s, "xla", ep_mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ep_engine_generates_same_tokens(model):
    from llamatpu.runtime.engine import Engine

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device CPU mesh")
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    base = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                  decode_window=4)
    r0 = base.generate([1, 5, 9, 13], 10, temperature=0.0)
    ep = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                decode_window=4, mesh=mesh, ep=True)
    r1 = ep.generate([1, 5, 9, 13], 10, temperature=0.0)
    assert r0.tokens == r1.tokens


def test_ep_dp_paged_serving_matches_unsharded(model):
    """The north-star MoE serving shape (dp x ep over a paged pool): tokens
    shard over dp, experts over tp, paged KV + prefix caching stay exact."""
    from llamatpu.runtime.engine import Engine
    from llamatpu.runtime.paged_engine import PagedBatchEngine
    from llamatpu.runtime.scheduler import BatchRequest, ContinuousBatcher

    if len(jax.devices()) < 4:
        pytest.skip("needs a 4-device CPU mesh")
    prompt = [5, 9, 23, 41, 8, 2, 7, 3, 1]
    ref = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                 decode_window=4).generate(prompt, 6).tokens
    mesh = make_mesh(tp=2, dp=2, devices=jax.devices()[:4])
    e = PagedBatchEngine(model, batch_size=2, block_size=4,
                         cache_dtype=jnp.float32, decode_window=4,
                         prefill_chunk=4, mesh=mesh, ep=True)
    b = ContinuousBatcher(e, stop_tokens=set())
    s1 = b.submit(BatchRequest(list(prompt), 6))
    cold = list(s1)
    s2 = b.submit(BatchRequest(list(prompt), 6))
    warm = list(s2)
    b.shutdown()
    assert cold == ref and warm == ref
    assert s2.cached_tokens == 8


def test_ep_dp_batch_engine_matches_unsharded(model):
    """dp x ep dense batched decode: per-lane generations bit-match B=1."""
    from llamatpu.runtime.batch_engine import BatchEngine
    from llamatpu.runtime.engine import Engine

    if len(jax.devices()) < 4:
        pytest.skip("needs a 4-device CPU mesh")
    prompts = [[1, 5, 9, 13], [2, 6, 10, 14]]
    refs = []
    base = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                  decode_window=4)
    for p in prompts:
        base.reset()
        refs.append(base.generate(p, 8, temperature=0.0).tokens)
    mesh = make_mesh(tp=2, dp=2, devices=jax.devices()[:4])
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32,
                     decode_window=4, mesh=mesh, ep=True)
    outs = be.generate_batch(prompts, 8)
    assert [list(o) for o in outs] == refs
