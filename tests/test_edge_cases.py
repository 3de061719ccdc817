"""Edge cases: decoupled head_dim (Devstral qDim != dim), context clamping,
context-length generation bound, empty/long chunk boundaries."""
import numpy as np
import pytest

import jax.numpy as jnp

import tiny_models
from oracle import Oracle
from llamatpu.gguf import GGMLType, GGUFReader, GGUFWriter
from llamatpu.models import loader as mloader
from llamatpu.models.transformer import forward_tokens, init_cache
from llamatpu.runtime.engine import Engine


def build_decoupled_head_gguf(path, head_dim=24, seed=41):
    """Devstral-style: head_dim * n_heads != dim (reference forwardJavaDevstral,
    InferenceCore.java:178-261: RoPE/attention over qDim, wo input qDim)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    dim, heads, kv_heads, hidden, layers, vocab, ctx = 64, 4, 2, 96, 2, 96, 64
    q_dim, kv_dim = heads * head_dim, kv_heads * head_dim
    w.add("general.architecture", "llama")
    w.add("general.name", "Devstral Tiny Decoupled")
    for k, v in [("embedding_length", dim), ("feed_forward_length", hidden),
                 ("block_count", layers), ("attention.head_count", heads),
                 ("attention.head_count_kv", kv_heads), ("context_length", ctx),
                 ("attention.layer_norm_rms_epsilon", 1e-5),
                 ("rope.freq_base", 10000.0), ("vocab_size", vocab),
                 ("attention.key_length", head_dim)]:
        w.add("llama." + k, v)

    def mat(o, i):
        return (rng.standard_normal((o, i)) / np.sqrt(i)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(vocab, dim))
    w.add_tensor("output_norm.weight", np.ones(dim, np.float32))
    w.add_tensor("output.weight", mat(vocab, dim))
    for i in range(layers):
        b = f"blk.{i}."
        w.add_tensor(b + "attn_norm.weight", np.ones(dim, np.float32))
        w.add_tensor(b + "ffn_norm.weight", np.ones(dim, np.float32))
        w.add_tensor(b + "attn_q.weight", mat(q_dim, dim))
        w.add_tensor(b + "attn_k.weight", mat(kv_dim, dim))
        w.add_tensor(b + "attn_v.weight", mat(kv_dim, dim))
        w.add_tensor(b + "attn_output.weight", mat(dim, q_dim))
        w.add_tensor(b + "ffn_gate.weight", mat(hidden, dim))
        w.add_tensor(b + "ffn_up.weight", mat(hidden, dim))
        w.add_tensor(b + "ffn_down.weight", mat(dim, hidden))
    w.write(str(path))


def test_decoupled_head_dim_matches_oracle(tmp_path):
    path = tmp_path / "dev.gguf"
    build_decoupled_head_gguf(path)
    model = mloader.load_model(str(path), mode="dequant", param_dtype=jnp.float32,
                               load_tokenizer=False)
    cfg = model.cfg
    assert cfg.head_dim == 24 and cfg.q_dim == 96 and cfg.q_dim != cfg.dim
    with GGUFReader(str(path)) as r:
        deq = {n: r.tensor_f32(n) for n in r.tensor_infos}
    orc = Oracle(cfg, deq, "devstral")
    cache = init_cache(cfg, 1, jnp.float32)
    for pos, tok in enumerate([3, 17, 42]):
        want = orc.forward(tok, pos)
        logits, cache = forward_tokens(cfg, model.weights,
                                       jnp.array([[tok]], jnp.int32), cache, pos,
                                       last_logit_only=True)
        np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=2e-4, atol=2e-4)


def test_context_clamp(tmp_path):
    path = tmp_path / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama")
    model = mloader.load_model(str(path), max_tokens=16, load_tokenizer=False)
    assert model.cfg.context_length == 16
    assert model.cfg.model_context_length == tiny_models.CTX
    # clamp never exceeds the model's own context
    model2 = mloader.load_model(str(path), max_tokens=10_000, load_tokenizer=False)
    assert model2.cfg.context_length == tiny_models.CTX


def test_generation_stops_at_cache_end(tmp_path):
    path = tmp_path / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama")
    model = mloader.load_model(str(path), load_tokenizer=False,
                               param_dtype=jnp.float32)
    e = Engine(model, cache_len=12, cache_dtype=jnp.float32, aot_compile=False,
               decode_window=4, prefill_chunk=4)
    res = e.generate([1, 2, 3, 4, 5], 100)
    # 5 prompt + generated tokens must fit in the 12-slot cache
    assert len(res.tokens) <= 12 - 5 + 1
    assert res.stop_reason == "length"


def test_prompt_exactly_one_chunk(tmp_path):
    path = tmp_path / "m.gguf"
    tiny_models.build_tiny_gguf(path, family="llama")
    model = mloader.load_model(str(path), load_tokenizer=False,
                               param_dtype=jnp.float32)
    e = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
               decode_window=4, prefill_chunk=4)
    a = e.generate([1, 2, 3, 4], 3).tokens  # exactly one full chunk
    e2 = Engine(model, cache_dtype=jnp.float32, aot_compile=False,
                decode_window=4, prefill_chunk=16)
    b = e2.generate([1, 2, 3, 4], 3).tokens  # padded chunk
    assert a == b
