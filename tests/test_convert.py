"""GGUF requantization tool: converted checkpoint loads and generates close to
the original."""
import numpy as np

import jax.numpy as jnp

import tiny_models
from llamatpu.gguf import GGMLType, GGUFReader
from llamatpu.gguf.convert import requantize_gguf
from llamatpu.models import loader as mloader
from llamatpu.runtime.engine import Engine


def test_requantize_roundtrip(tmp_path):
    src = tmp_path / "src.gguf"
    dst = tmp_path / "dst.gguf"
    tiny_models.build_tiny_gguf(src, family="llama", quant=GGMLType.F16,
                                with_tokenizer=True, seed=43)
    stats = requantize_gguf(str(src), str(dst))
    assert stats["requantized"] > 0

    with GGUFReader(str(dst)) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.tensor_infos["blk.0.attn_q.weight"].ggml_type == GGMLType.Q8_0
        assert list(r.metadata["tokenizer.ggml.tokens"])  # tokenizer survived

    # logits of the converted model track the original closely (Q8_0 noise on
    # random weights can flip near-tied argmaxes, so compare logits not chains)
    from llamatpu.models.transformer import forward_tokens, init_cache

    m1 = mloader.load_model(str(src), param_dtype=jnp.float32, load_tokenizer=False)
    m2 = mloader.load_model(str(dst), param_dtype=jnp.float32, load_tokenizer=False)
    c1 = init_cache(m1.cfg, 1, jnp.float32)
    c2 = init_cache(m2.cfg, 1, jnp.float32)
    l1, _ = forward_tokens(m1.cfg, m1.weights, jnp.asarray([[5]], jnp.int32), c1, 0,
                           last_logit_only=True)
    l2, _ = forward_tokens(m2.cfg, m2.weights, jnp.asarray([[5]], jnp.int32), c2, 0,
                           last_logit_only=True)
    err = float(jnp.abs(l1 - l2).max())
    spread = float(jnp.abs(l1).max())
    assert err < 0.05 * max(spread, 1.0)
