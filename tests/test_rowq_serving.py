"""q8_row as a FULL serving format (VERDICT r3 #1/#4): every engine
(Engine/BatchEngine/PagedBatchEngine), sharded meshes, and MoE expert stacks
must run the per-row int8 format, and batched/paged/sharded execution must
bit-match the single-sequence rowq engine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType
from llamatpu.models import loader as mloader
from llamatpu.parallel import make_mesh
from llamatpu.runtime.batch_engine import BatchEngine
from llamatpu.runtime.engine import Engine
from llamatpu.runtime.paged_engine import PagedBatchEngine

PROMPTS = [[5, 9, 23, 41], [7, 3, 11]]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("rowq") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama", quant=GGMLType.Q8_0, seed=23)
    return mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                              load_tokenizer=False)


@pytest.fixture(scope="module")
def single_rowq_tokens(model):
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
               decode_window=4, rowq=True)
    return [e.generate(p, 6).tokens for p in PROMPTS]


def test_rowq_weights_converted(model):
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False, rowq=True)
    lw = e.weights["layers"]
    wq = lw.get("wqkv", lw.get("wq"))  # tiny rows pad -> qkv may stay unfused
    assert wq.kind == "q8_row" and wq.scales.shape[-1] == 1
    assert e.weights["wcls"].kind == "q8_row"


def test_rowq_batch_engine_matches_single(model, single_rowq_tokens):
    be = BatchEngine(model, batch_size=2, cache_dtype=jnp.float32,
                     decode_window=4, rowq=True)
    outs = be.generate_batch(PROMPTS, 6)
    assert outs == single_rowq_tokens


def test_rowq_paged_engine_matches_single(model, single_rowq_tokens):
    pe = PagedBatchEngine(model, batch_size=2, block_size=8, max_len=64,
                          cache_dtype=jnp.float32, decode_window=4, rowq=True)
    outs = pe.generate_batch(PROMPTS, 6)
    assert outs == single_rowq_tokens


def test_rowq_tp2_matches_unsharded(model, single_rowq_tokens):
    """The r3 single-chip assert is gone: rowq weights shard over tp (q8_row
    scales follow the out-axis shard; in-axis shards replicate them)."""
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
               decode_window=4, mesh=mesh, rowq=True)
    assert e.generate(PROMPTS[0], 6).tokens == single_rowq_tokens[0]


def test_rowq_weights_actually_sharded(model):
    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False, mesh=mesh,
               rowq=True)
    wq = e.weights["layers"]["wq"]
    assert wq.kind == "q8_row"
    assert len(wq.qs.addressable_shards) == 2
    # column-parallel: qs AND the per-row scales split on the out axis
    assert wq.qs.addressable_shards[0].data.shape[1] == wq.qs.shape[1] // 2
    assert wq.scales.addressable_shards[0].data.shape[1] == wq.scales.shape[1] // 2
    # row-parallel wo: qs in-axis split, [O, 1] scales replicated
    wo = e.weights["layers"]["wo"]
    assert wo.qs.addressable_shards[0].data.shape[2] == wo.qs.shape[2] // 2
    assert wo.scales.addressable_shards[0].data.shape == wo.scales.shape


def test_rowq_pp2_matches_unsharded(model, single_rowq_tokens):
    mesh = make_mesh(tp=1, dp=1, pp=2, devices=jax.devices()[:2])
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
               decode_window=4, mesh=mesh, rowq=True)
    assert e.generate(PROMPTS[0], 6).tokens == single_rowq_tokens[0]


# ------------------------------------------------------------------ MoE
@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("rowq_moe") / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="qwen2moe", quant=GGMLType.Q8_0,
                                seed=29)
    return mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                              load_tokenizer=False)


def test_rowq_moe_expert_stacks_converted(moe_model):
    e = Engine(moe_model, cache_dtype=jnp.float32, aot_compile=False, rowq=True)
    lw = e.weights["layers"]
    for k in ("gate_exps", "up_exps", "down_exps"):
        assert lw[k].kind == "q8_row" and lw[k].scales.shape[-1] == 1


def test_rowq_moe_grouped_kernel_matches_xla(moe_model):
    """The grouped rowq kernel (scale-free expert streams, per-row scale in
    the output tile) computes the same routed FFN as the XLA dequant scan on
    IDENTICAL q8_row weights."""
    from llamatpu.models.transformer import forward_tokens, init_cache
    from llamatpu.models.weights import rowq_convert_weights

    w = rowq_convert_weights(moe_model.weights)
    outs = {}
    for impl in ("xla", "pallas"):
        cache = init_cache(moe_model.cfg, 1, jnp.float32)
        logits, cache = forward_tokens(
            moe_model.cfg, w, jnp.array([[3, 17, 42]], jnp.int32), cache, 0,
            impl=impl, last_logit_only=True)
        outs[impl] = np.asarray(logits[0])
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=2e-4, atol=2e-4)


def test_rowq_moe_engine_decodes(moe_model):
    e = Engine(moe_model, impl="pallas", cache_dtype=jnp.float32,
               aot_compile=False, decode_window=4, rowq=True)
    out = e.generate([3, 17, 42], 6)
    assert len(out.tokens) == 6
