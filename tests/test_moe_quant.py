"""Qwen2-MoE in quantized mode (expert QTensors gathered per token) vs oracle,
on both the XLA and Pallas matmul paths."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from oracle import Oracle
from llamatpu.gguf import GGMLType, GGUFReader
from llamatpu.models import loader as mloader
from llamatpu.models.transformer import forward_tokens, init_cache


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_moe_q8_matches_oracle(tmp_path, impl):
    path = tmp_path / f"moe_{impl}.gguf"
    tiny_models.build_tiny_gguf(path, family="qwen2moe", quant=GGMLType.Q8_0, seed=31)
    model = mloader.load_model(str(path), mode="quant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    with GGUFReader(str(path)) as r:
        deq = {n: r.tensor_f32(n) for n in r.tensor_infos}
    orc = Oracle(model.cfg, deq, "qwen2moe")
    cache = init_cache(model.cfg, 1, jnp.float32)
    for pos, tok in enumerate([3, 17, 42]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(model.cfg, model.weights,
                                       jnp.array([[tok]], jnp.int32), cache, pos,
                                       impl=impl, last_logit_only=True)
        np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=6e-3, atol=6e-3)
