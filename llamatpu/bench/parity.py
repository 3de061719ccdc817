"""Hermetic quantization-parity harness: the ppl table BASELINE.json demands
(Q8_0 within ~0.01 of FP16; Q4_0 within GGUF's stated delta), measurable with
zero egress.

Method: ONE f32 master checkpoint at production geometry (seeded synthetic
weights), a fixed corpus SAMPLED FROM THE MASTER ITSELF (so the scored tokens
sit in the model's own high-probability region — quantization error shows up
in the NLL instead of washing out against random-token entropy), then every
quantization variant derives from the same master by the exact ggml encode
(gguf/quants.py, bit-oracle-tested) and scores the same corpus:

  f32           dense float32 weights (the reference numerics)
  bf16          dense bfloat16 (TPU-native dense serving dtype)
  q8_0          Q8_0 via the fused bf16-dequant pallas kernel (serving default)
  q8_0-int8dot  Q8_0 via the EXACT llama.cpp int8xint8 dot (ops/int8_matmul.py,
                activations ggml-quantized per 32-block — the ppl-parity mode,
                Q8_0FloatTensor.java:70-121)
  q8_0-kvint8   q8_0 weights + int8 KV cache (ops/kv_quant.py)
  q4_0          Q4_0 fused dequant
  q4_0-pack4    Q4_0 packed nibbles (--pack4 storage)
  q4_k          NATIVE Q4_K (gguf/quants.q4_k_views: Q4_0 kernels + per-32
                additive offsets via the xbsum epilogue dot) — the K-quant
                compute path; encode is the simplified single-pass ggml-order
                quantize_q4_k, so the delta bounds OUR encoder+path, and a
                real llama.cpp-encoded checkpoint can only do better
  q4_k-pack4    q4_k packed nibbles (the serving storage for K-quant GGUFs)
  q8_row        Q8_0 re-quantized per OUT ROW (--rowq serving format,
                models/weights.py rowq_requant): decode cast-and-dot kernel
  q8_row-a8     q8_row with the int8 MXU path FORCED at every width — adds
                the per-token activation quantization the prefill/batch
                GEMMs use (ops/int8_prefill.py); measures the full w8a8 loss

Caveat (documented, not hidden): the master is random, so absolute ppl values
are meaningless; the DELTAS between variants measure numeric fidelity of each
quantized compute path against f32 on identical weights, which is the claim a
real-checkpoint run would also make. scripts/run_parity.py writes PARITY.md;
tests/test_parity_gate.py gates the same deltas at tiny geometry in CI.
"""
from __future__ import annotations

import numpy as np

VARIANTS = ("f32", "bf16", "q8_0", "q8_0-int8dot", "q8_0-kvint8",
            "q4_0", "q4_0-pack4", "q4_k", "q4_k-pack4", "q5_k", "q8_row",
            "q8_row-noeq", "q8_row-a8")

# keys quantized in a real GGUF checkpoint: the dense llama graph, plus the
# MoE routed-expert stacks and the always-on shared expert (router /
# shared_gate_inp stay f32 in real checkpoints, as in the loader). Fused
# wqkv/w13/shared_g13 are exercised automatically: the Engine fuses QTensors
# at load (models/weights.py fuse_layer_weights), so every quantized variant
# scores THROUGH the fused kernels.
_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3",
                "gate_exps", "up_exps", "down_exps",
                "shared_gate", "shared_up", "shared_down")


def build_master(preset: str, seed: int = 0, **overrides):
    """Dense f32 model at `preset` geometry — the single source checkpoint."""
    from llamatpu.models.synthetic import build_synthetic_model

    return build_synthetic_model(preset, quant="none", dtype="f32", seed=seed,
                                 overrides=overrides or None)


def make_variant(master, variant: str):
    """Derive a variant model from the master by the exact ggml encodes.
    Returns (model, ppl_kwargs) where ppl_kwargs feed bench.perplexity."""
    import jax.numpy as jnp

    from llamatpu.models.loader import LoadedModel
    from llamatpu.models.weights import (prepare_qtensor, quantize_array_q4_0,
                                         quantize_array_q4_k,
                                         quantize_array_q8_0, rowq_requant)

    kind = ("q8_row" if variant.startswith("q8_row")
            else "q8_0" if variant.startswith("q8_0")
            else "q5_k" if variant.startswith("q5_k")
            else "q4_k" if variant.startswith("q4_k")
            else "q4_0" if variant.startswith("q4_0") else None)
    # q8_row converts at the LAYERS level below (equalized fold needs the
    # whole layer, weights.equalize_rowq_layers); conv() emits q8_0 for it
    pack4 = variant.endswith("-pack4")
    impl = ("int8" if variant == "q8_0-int8dot"
            else "xla" if kind is None else "pallas")
    cache_dtype = jnp.int8 if variant == "q8_0-kvint8" else jnp.float32

    w = dict(master.weights)
    lw = dict(w["layers"])

    def conv(arr):
        arr = np.asarray(arr)
        if kind is None:
            return arr.astype(np.float32 if variant == "f32" else jnp.bfloat16)
        if kind == "q8_row":  # stage 1 of the exact load path: GGUF Q8_0
            return prepare_qtensor(quantize_array_q8_0(arr))
        from llamatpu.models.weights import quantize_array_q5_k

        q = (quantize_array_q8_0(arr) if kind == "q8_0"
             else quantize_array_q4_k(arr) if kind == "q4_k"
             else quantize_array_q5_k(arr) if kind == "q5_k"
             else quantize_array_q4_0(arr))
        return prepare_qtensor(q, pack4=pack4)

    for k in _MATMUL_KEYS:
        if k in lw:
            # routed experts convert too under --rowq (round 4: the grouped
            # kernels have a rowq variant) — conv handles every key uniformly
            lw[k] = conv(lw[k])
    if kind == "q8_row":
        # stage 2: the --rowq load-time conversion at the layers level —
        # equalized fold (production default) or plain per-row requant
        import os

        from llamatpu.models.weights import equalize_rowq_layers

        if variant == "q8_row-noeq":
            os.environ["LLAMATPU_NO_ROWQ_EQ"] = "1"
        try:
            lw = equalize_rowq_layers(lw)
        finally:
            if variant == "q8_row-noeq":
                os.environ.pop("LLAMATPU_NO_ROWQ_EQ", None)
        for k in _MATMUL_KEYS:
            if (k in lw and hasattr(lw[k], "kind") and lw[k].kind == "q8_0"):
                lw[k] = rowq_requant(lw[k])
    w["layers"] = lw
    w["wcls"] = (rowq_requant(conv(w["wcls"])) if kind == "q8_row"
                 else conv(w["wcls"]))
    # token embedding: real checkpoints quantize it too; the lookup reads the
    # dequantized values, so apply quantize->dequant to the dense table
    if kind is not None:
        emb_q = conv(w["tok_emb"])
        w["tok_emb"] = np.asarray(emb_q.dequant(jnp.float32))
    elif variant == "bf16":
        w["tok_emb"] = np.asarray(w["tok_emb"]).astype(jnp.bfloat16)

    model = LoadedModel(cfg=master.cfg, weights=w, metadata=dict(master.metadata),
                        family=master.family, quant_label=variant)
    return model, dict(impl=impl, dtype=cache_dtype)


def apply_spectrum(master, spectrum: str | None, seed: int = 123):
    """Re-draw the master's matmul weights from a REALISTIC spectrum instead
    of the builder's plain gaussians. The r4 verdict's q8_row caveat: the
    random-weight corpus can't say how per-row int8 scaling behaves on real
    checkpoints, whose weight matrices have heavy tails and OUTLIER input
    channels (the structure that stresses one-scale-per-row quantization —
    an outlier column inflates the row amax and coarsens everything else,
    while q8_0's per-32 blocks localize it).

    spectrum "heavy": student-t(4) body matched to the builder's std + 1% of
    input channels scaled 8x (per matrix, seeded) — the LLM.int8()/AWQ
    outlier-channel structure. None/"random" returns the master unchanged."""
    if spectrum in (None, "random"):
        return master
    assert spectrum == "heavy", spectrum
    from llamatpu.models.loader import LoadedModel

    rng = np.random.default_rng(seed)
    w = dict(master.weights)
    lw = dict(w["layers"])

    def heavy(arr):
        arr = np.asarray(arr)
        out = rng.standard_t(df=4, size=arr.shape).astype(np.float32)
        out *= float(arr.std()) / max(float(out.std()), 1e-9)
        ncol = max(1, arr.shape[-1] // 128)
        cols = rng.choice(arr.shape[-1], ncol, replace=False)
        out[..., cols] *= 8.0
        # keep the layer's effective gain close to the builder's stable
        # scaling so the master still generates a usable corpus
        out *= float(np.abs(arr).mean()) / max(float(np.abs(out).mean()), 1e-9)
        return out

    for k in _MATMUL_KEYS:
        if k in lw:
            lw[k] = heavy(lw[k])
    w["layers"] = lw
    w["wcls"] = heavy(w["wcls"])
    return LoadedModel(cfg=master.cfg, weights=w,
                       metadata=dict(master.metadata), family=master.family,
                       quant_label=master.quant_label)


def sample_corpus(master, n: int, seed: int = 42, prompt_len: int = 8):
    """Corpus = the master's own temperature-0.8 sample (seeded) so scored
    tokens live where the model puts probability mass."""
    import jax.numpy as jnp

    from llamatpu.runtime.engine import Engine

    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, master.cfg.vocab_size, prompt_len).tolist()
    eng = Engine(master, cache_len=min(n + prompt_len + 8, master.cfg.context_length),
                 temperature=0.8, seed=seed, cache_dtype=jnp.float32,
                 impl="xla", aot_compile=False)
    res = eng.generate(prompt, n - prompt_len)
    del eng
    return prompt + list(res.tokens)


def parity_table(preset: str = "llama32-1b", corpus_len: int = 1024,
                 cache_len: int = 512, seed: int = 0,
                 variants=VARIANTS, spectrum: str | None = None,
                 force_impl: str | None = None, chunk: int = 16,
                 **overrides) -> list[dict]:
    from llamatpu.bench.perplexity import perplexity

    assert variants[0] == "f32", "the first variant anchors the deltas"
    master = apply_spectrum(build_master(preset, seed=seed, **overrides),
                            spectrum)
    corpus = sample_corpus(master, corpus_len)
    rows = []
    base_ppl = None
    # chunk=16 for EVERY variant: (a) the exact-int8 dot only covers T<=16
    # (ops/int8_matmul._T_LIMIT), and (b) chunk feeds the sliding-window
    # stride rounding — deltas are only meaningful when every variant scores
    # IDENTICAL windows with identical context
    for v in variants:
        import sys
        import time as _t

        print(f"# parity {preset}: variant {v}...", file=sys.stderr, flush=True)
        _t0 = _t.time()
        model, kw = make_variant(master, v)
        if force_impl is not None and kw.get("impl") == "pallas":
            # escape for geometries whose pallas program the axon remote-
            # compile service cannot build (PARITY.md MoE note): impl="xla"
            # scores the same quantized VALUES through the dequant path —
            # it pins format fidelity; the grouped-kernel path stays gated
            # by the reduced-geometry CI shapes
            kw = dict(kw, impl=force_impl)
        if v.endswith("-a8"):
            # force the int8 MXU activation-quant path at the ppl chunk width
            # (normally prefill-only, T >= INT8_MXU_MIN_T)
            from llamatpu.ops import int8_prefill

            saved, int8_prefill.INT8_MXU_MIN_T = int8_prefill.INT8_MXU_MIN_T, 1
            try:
                r = perplexity(model, corpus, chunk=16, cache_len=cache_len,
                               stride=cache_len // 2, **kw)
            finally:
                int8_prefill.INT8_MXU_MIN_T = saved
        else:
            r = perplexity(model, corpus, chunk=16, cache_len=cache_len,
                           stride=cache_len // 2, **kw)
        if v == "f32":
            base_ppl = r["ppl"]
        rows.append({"variant": v, "ppl": r["ppl"], "tokens": r["tokens"],
                     "delta": r["ppl"] - base_ppl if base_ppl else 0.0,
                     "rel": (r["ppl"] - base_ppl) / base_ppl if base_ppl else 0.0})
        print(f"#   {v}: ppl {r['ppl']:.4f} ({_t.time()-_t0:.0f}s)",
              file=sys.stderr, flush=True)
        del model
    return rows
