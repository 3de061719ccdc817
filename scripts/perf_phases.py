#!/usr/bin/env python3
"""Per-phase decode-step breakdown on the real chip (PERF.md's data source).

Splits one decode step into its phases and times each as a standalone jitted
fori_loop (N iterations amortize dispatch; timing is synced by reading a host
value, per the relay-timing rule in CLAUDE.md):

  full          the production decode window program (engine.decode_window_run)
  matmul_chain  the per-layer stacked weight matmuls only (wqkv->wo->w13->w2
                with elementwise glue), scan over layers — the weight stream
  attn          decode attention only (stacked-cache kernel), scan over layers
  glue          norms + rope + KV cache writes + residual adds, scan (no matmuls)
  head          final norm + vocab projection + argmax
  writes        KV dynamic_update_slice writes alone, scan

Reports each phase's ms/token, effective GB/s over the bytes it streams, and
the residual (full - sum of parts) = while_loop/sampling/fusion overhead.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_phases.py [preset quant]
"""
from __future__ import annotations

import faulthandler
import functools
import json
import pathlib
import sys
import time

faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 64
REPS = 3


def timed(prog, state, n_tokens=ITERS, reps=REPS):
    """Best-of-reps seconds per iteration for prog(state)->state."""
    out = prog(state)
    jax.block_until_ready(out)
    print("    [compiled+warm]", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = prog(state)
        _ = np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]))
        best = min(best, time.perf_counter() - t0)
    return best / n_tokens


def qbytes(t) -> int:
    from llamatpu.models.weights import QTensor

    if isinstance(t, QTensor):
        return t.qs.size * t.qs.dtype.itemsize + t.scales.size * 4
    return t.size * t.dtype.itemsize


def moe_phase_programs(eng, pos: int):
    """Ablation programs for a Qwen2-MoE engine: the matmul chain splits into
    attention-side matmuls (wqkv/wo), the always-on shared expert, and the
    routed top-k grouped-expert kernels (ops/moe_grouped.py), so the breakdown
    says which stream underruns the DMA rate."""
    import jax.numpy as jnp

    from llamatpu.models.transformer import _moe_ffn
    from llamatpu.ops.matmul import matmul

    cfg = eng.cfg
    W = eng.weights
    slw = W["layers"]
    L = cfg.n_layers
    li_arr = jnp.arange(L, dtype=jnp.int32)

    def loop(token_fn):
        def body(_, s):
            return token_fn(s)

        return jax.jit(lambda s: jax.lax.fori_loop(0, ITERS, body, s))

    progs = {}

    def attn_mm_token(x):
        def layer(x, li):
            y1 = matmul(slw["wqkv"], x, "pallas", li=li)
            a = y1[..., : cfg.q_dim]
            y2 = matmul(slw["wo"], a, "pallas", li=li)
            return x + y2 * 1e-6, None

        x, _ = jax.lax.scan(layer, x, li_arr)
        return x

    progs["attn_matmuls"] = (loop(attn_mm_token),
                             jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
                             sum(qbytes(slw[k]) for k in ("wqkv", "wo")))

    def shared_token(x):
        def layer(x, li):
            g13 = matmul(slw["shared_g13"], x, "pallas", li=li)
            ff = g13.shape[-1] // 2
            act = (jax.nn.silu(g13[..., :ff].astype(jnp.float32))
                   .astype(x.dtype) * g13[..., ff:])
            y = matmul(slw["shared_down"], act, "pallas", li=li)
            return x + y * 1e-6, None

        x, _ = jax.lax.scan(layer, x, li_arr)
        return x

    progs["shared_expert"] = (loop(shared_token),
                              jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
                              sum(qbytes(slw[k]) for k in ("shared_g13", "shared_down")))

    # routed experts: full _moe_ffn minus the shared-expert terms is awkward to
    # split; run the whole MoE FFN (router + routed grouped kernels + shared)
    # and subtract the shared phase in the report
    def moe_token(x):
        def layer(x, li):
            lw = jax.tree.map(lambda a: (a.__class__(a.qs[li], a.scales[li], a.kind,
                                                     a.logical_out, a.layout)
                                         if hasattr(a, "qs") else a[li]),
                              slw, is_leaf=lambda a: hasattr(a, "qs"))
            y = _moe_ffn(cfg, x, lw, "pallas", None, slw, li)
            return x + y * 1e-6, None

        x, _ = jax.lax.scan(layer, x, li_arr)
        return x

    # active-expert bytes/token: top-k routed (3 mats each) + shared
    eb = 0
    for k in ("gate_exps", "up_exps", "down_exps"):
        t = slw[k]
        per_expert = qbytes(t) // (cfg.n_layers * cfg.n_experts)
        eb += per_expert * cfg.n_experts_used * cfg.n_layers
    eb += sum(qbytes(slw[k]) for k in ("shared_g13", "shared_down"))
    progs["moe_ffn(routed+shared)"] = (loop(moe_token),
                                       jnp.zeros((1, 1, cfg.dim), jnp.bfloat16), eb)
    return progs


def phase_programs(eng, pos: int):
    """Build the ablation programs for a DENSE model engine."""
    from llamatpu.models.transformer import _write_rows, rope_slices
    from llamatpu.ops.matmul import matmul
    from llamatpu.ops.pallas_attention import decode_attention_auto
    from llamatpu.ops.rmsnorm import rmsnorm
    from llamatpu.ops.rope import apply_rope

    cfg = eng.cfg
    W = eng.weights
    slw = W["layers"]
    L = cfg.n_layers
    li_arr = jnp.arange(L, dtype=jnp.int32)
    pos_vec = jnp.full((1,), pos, jnp.int32)
    kv, g, hd = cfg.n_kv_heads, cfg.gqa_groups, cfg.head_dim
    keys = [k for k in ("wqkv", "wq", "wk", "wv", "wo", "w13", "w1", "w3", "w2")
            if k in slw]

    def loop(token_fn):
        def body(_, s):
            return token_fn(s)

        return jax.jit(lambda s: jax.lax.fori_loop(0, ITERS, body, s))

    progs = {}

    # --- matmul chain: the stacked weight stream with elementwise glue
    def mm_token(x):
        def layer(x, li):
            if "wqkv" in slw:
                y1 = matmul(slw["wqkv"], x, "pallas", li=li)
            else:
                y1 = jnp.concatenate(
                    [matmul(slw[k], x, "pallas", li=li) for k in ("wq", "wk", "wv")],
                    axis=-1)
            a = y1[..., : cfg.q_dim]
            y2 = matmul(slw["wo"], a, "pallas", li=li)
            if "w13" in slw:
                y3 = matmul(slw["w13"], y2, "pallas", li=li)
            else:
                y3 = jnp.concatenate(
                    [matmul(slw[k], y2, "pallas", li=li) for k in ("w1", "w3")],
                    axis=-1)
            y4 = matmul(slw["w2"], y3[..., : cfg.hidden_dim], "pallas", li=li)
            return x + y4 * 1e-6, None

        x, _ = jax.lax.scan(layer, x, li_arr)
        return x

    progs["matmul_chain"] = (loop(mm_token),
                             jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
                             sum(qbytes(slw[k]) for k in keys))

    # --- attention only (stacked-cache pallas kernel per layer)
    kc, vc = eng.cache.k, eng.cache.v
    attn_bytes = int(2 * L * kv * (pos + 16) * hd * kc.dtype.itemsize)

    def attn_token(q4):
        def layer(q4, li):
            o = decode_attention_auto(q4, kc, vc, pos_vec, cfg.attn_score_scale,
                                      s_limit=eng.cache_len, layer_index=li)
            return q4 + o.reshape(q4.shape) * 1e-6, None

        q4, _ = jax.lax.scan(layer, q4, li_arr)
        return q4

    progs["attn"] = (loop(attn_token),
                     jnp.ones((1, kv, g, hd), jnp.bfloat16) * 0.01, attn_bytes)

    # --- glue: norms + rope + cache writes + residuals (no matmuls)
    cos, sin = rope_slices(W, pos_vec, 1)

    def glue_token(carry):
        x, kc_, vc_ = carry

        def layer(carry, per):
            x, kc_, vc_ = carry
            lw, li = per
            h = rmsnorm(x, lw["attn_norm"], cfg.rms_norm_eps)
            k = h[..., : kv * hd].reshape(1, 1, kv, hd)
            k = apply_rope(k, cos, sin, cfg.rope_style)
            v = h[..., : kv * cfg.v_head_dim].reshape(1, 1, kv, cfg.v_head_dim)
            kc_ = _write_rows(kc_, k.transpose(0, 2, 1, 3), li, pos_vec, None, None)
            vc_ = _write_rows(vc_, v.transpose(0, 2, 1, 3), li, pos_vec, None, None)
            h2 = rmsnorm(x, lw["ffn_norm"], cfg.rms_norm_eps)
            x = x + h.astype(x.dtype) * 1e-6 + h2.astype(x.dtype) * 1e-6
            return (x, kc_, vc_), None

        carry, _ = jax.lax.scan(layer, (x, kc_, vc_), (slw, li_arr))
        return carry

    progs["glue"] = (loop(glue_token),
                     (jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
                      jnp.zeros_like(kc), jnp.zeros_like(vc)), 0)

    # --- head: final norm + vocab matmul + argmax
    from llamatpu.models.transformer import finish_logits

    def head_token(x):
        logits = finish_logits(cfg, W, x, "pallas", last_logit_only=True)
        nxt = jnp.argmax(logits, axis=-1)
        return x + (nxt[:, None] * 0).astype(x.dtype)[:, :, None] * 1e-6

    progs["head"] = (loop(head_token), jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
                     qbytes(W["wcls"]))

    # --- writes only
    def writes_token(carry):
        x, kc_, vc_ = carry

        def layer(carry, li):
            x, kc_, vc_ = carry
            k = x[..., : kv * hd].reshape(1, 1, kv, hd)
            kc_ = _write_rows(kc_, k.transpose(0, 2, 1, 3), li, pos_vec, None, None)
            vc_ = _write_rows(vc_, k.transpose(0, 2, 1, 3), li, pos_vec, None, None)
            return (x, kc_, vc_), None

        carry, _ = jax.lax.scan(layer, (x, kc_, vc_), li_arr)
        return carry

    progs["writes"] = (loop(writes_token),
                       (jnp.ones((1, 1, cfg.dim), jnp.bfloat16),
                        jnp.zeros_like(kc), jnp.zeros_like(vc)), 0)

    return progs


def run_preset(preset: str, quant: str, pack4: bool):
    from llamatpu.models.synthetic import build_synthetic_model
    from llamatpu.runtime.engine import Engine

    print(f"=== {preset} {quant}{'-pack4' if pack4 else ''} ===", flush=True)
    t0 = time.perf_counter()
    model = build_synthetic_model(preset, quant=quant, pack4=pack4)
    print(f"  [weights built {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    eng = Engine(model, cache_len=1024, prefill_chunk=512, impl="pallas",
                 temperature=0.0, decode_window=128)
    print(f"  [engine ready {time.perf_counter()-t0:.0f}s "
          f"(upload {eng.metrics.weight_upload_s:.0f}s "
          f"compile {eng.metrics.compile_s:.0f}s)]", flush=True)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, model.cfg.vocab_size, 512).tolist()
    tok, _ = eng.prefill(prompt, 0)
    cur, pos = int(tok[0]), 512
    print("  [prefill done]", flush=True)

    # full production window, timed over 64 tokens
    t0 = time.perf_counter()
    done = 0
    while done < ITERS:
        w = eng.decode_window_run(cur, pos, ITERS - done)
        cur, pos, done = w[-1], pos + len(w), done + len(w)
    full_s = (time.perf_counter() - t0) / ITERS
    # second rep (first may include compile)
    t0 = time.perf_counter()
    done = 0
    while done < ITERS:
        w = eng.decode_window_run(cur, pos, ITERS - done)
        cur, pos, done = w[-1], pos + len(w), done + len(w)
    full_s = min(full_s, (time.perf_counter() - t0) / ITERS)

    print(f"  full window: {full_s*1e3:.3f} ms/tok ({1/full_s:.1f} tok/s)",
          flush=True)
    rows = [{"phase": "full", "ms": full_s * 1e3, "gbs": None}]
    total_parts = 0.0
    progs = (moe_phase_programs(eng, 512) if eng.cfg.is_moe
             else phase_programs(eng, 512))
    for name, (prog, state, nbytes) in progs.items():
        print(f"  [{name}: tracing+compiling...]", flush=True)
        s = timed(prog, state)
        total_parts += s
        rows.append({"phase": name, "ms": s * 1e3,
                     "gbs": (nbytes / s / 1e9) if nbytes else None,
                     "bytes_per_tok": nbytes or None})
        print(f"  {name:14s} {s*1e3:7.3f} ms/tok"
              + (f"  {nbytes/s/1e9:6.1f} GB/s ({nbytes/1e6:.0f} MB/tok)" if nbytes else ""),
              flush=True)
    resid = full_s * 1e3 - total_parts * 1e3
    rows.append({"phase": "residual(full-parts)", "ms": resid, "gbs": None})
    print(f"  {'full':14s} {full_s*1e3:7.3f} ms/tok  ({1/full_s:.1f} tok/s)")
    print(f"  {'residual':14s} {resid:7.3f} ms/tok", flush=True)
    return {"preset": preset, "quant": quant + ("-pack4" if pack4 else ""),
            "tok_s": 1 / full_s, "rows": rows}


def main():
    targets = [("llama32-1b", "q8_0", False)]
    if len(sys.argv) > 1:
        preset = sys.argv[1]
        quant = sys.argv[2] if len(sys.argv) > 2 else "q8_0"
        targets = [(preset, quant.replace("-pack4", ""), quant.endswith("-pack4"))]
    out = [run_preset(*t) for t in targets]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
