#!/usr/bin/env python3
"""Per-phase decode-step breakdown on the real chip (PERF.md's data source).

Each phase is ONE small jitted program: a lax.scan over `tile(arange(L),
REPEAT)` whose body runs a single kernel (one projection matmul, or decode
attention, or the no-matmul glue), so one dispatch executes REPEAT full
per-token weight streams. Programs are kept deliberately tiny because the
axon remote-compile service drops connections on big ones (a fori(64) wrapper
around the 4-matmul layer chain died with 'Broken pipe' after ~25 min of
remote compile, twice — 2026-08-21); per-projection programs also give a finer
breakdown than the combined chain.

Reports each phase's ms per token-equivalent (one full stream pass), the
effective GB/s over the bytes it streams, and the residual
(full - sum of parts) = while_loop/sampling/dispatch overhead.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/perf_phases.py [preset quant]
"""
from __future__ import annotations

import faulthandler
import functools
import json
import pathlib
import sys
import time

faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 64     # tokens timed for the full production window
# Full weight-stream passes per phase dispatch. Must amortize BOTH the ~30ms
# relay RTT and timing jitter: pass counts are sized so device exec is
# >~100ms per dispatch (an RTT-sized residual is additionally measured with
# an empty dispatch and subtracted).
REPEAT_MM = 512
REPEAT_CHEAP = 2048   # attn/glue/writes: ~0.01-0.03 ms/pass phases
REPEAT_HEAD = 256


def timed(prog, state, n, reps=3):
    """Best-of-reps seconds per pass for prog(state)->state (n passes/call)."""
    t0 = time.perf_counter()
    out = prog(state)
    jax.block_until_ready(out)
    print(f"    [compiled+warm {time.perf_counter()-t0:.0f}s]", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = prog(state)
        _ = np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]))
        best = min(best, time.perf_counter() - t0)
    return best / n


def qbytes(t) -> int:
    from llamatpu.models.weights import QTensor

    if isinstance(t, QTensor):
        return t.qs.size * t.qs.dtype.itemsize + t.scales.size * 4
    return t.size * t.dtype.itemsize


def phase_programs(eng, pos: int):
    """Small per-phase programs. Dense models: one per projection matmul +
    attention + glue + writes + head. MoE: attention-side matmuls, shared
    expert, routed grouped FFN."""
    from llamatpu.models.transformer import _write_rows, rope_slices
    from llamatpu.ops.matmul import matmul
    from llamatpu.ops.pallas_attention import decode_attention_auto
    from llamatpu.ops.rmsnorm import rmsnorm
    from llamatpu.ops.rope import apply_rope

    cfg = eng.cfg
    W = eng.weights
    slw = W["layers"]
    L = cfg.n_layers
    def li_rep_n(r):
        return jnp.tile(jnp.arange(L, dtype=jnp.int32), r)
    pos_vec = jnp.full((1,), pos, jnp.int32)
    kv, g, hd = cfg.n_kv_heads, cfg.gqa_groups, cfg.head_dim
    progs = {}

    def stream_phase(key, t=1, repeat=None):
        """scan(L*repeat) of one stacked matmul; carry folds the output back
        into a fixed-width state so the body has a single kernel. t>1 = the
        prefill GEMM shape (int8-MXU path for rowq at t >= INT8_MXU_MIN_T)."""
        repeat = repeat or REPEAT_MM
        qt = slw[key]
        in_dim = qt.qs.shape[-1] * (2 if getattr(qt, "layout", "") == "packed4" else 1)
        if getattr(qt, "kind", "") == "q8_row":
            in_dim = qt.qs.shape[-1]

        def step(qt, x, li):
            y = matmul(qt, x, "pallas", li=li)
            o = y.shape[-1]
            if o >= in_dim:
                x = x + y[..., :in_dim].astype(x.dtype) * 1e-6
            else:
                x = x + jnp.pad(y, ((0, 0), (0, 0), (0, in_dim - o))).astype(x.dtype) * 1e-6
            return x, None

        # weights are ARGUMENTS, not closures: a closed-over stack becomes
        # an embedded constant and the remote compile ships a 300-450 MB
        # payload ("Broken pipe" after ~25 min — found 2026-08-21)
        def prog_fn(st):
            def step_a(x, li):
                return step(st["qt"], x, li)

            x, _ = jax.lax.scan(step_a, st["x"], li_rep_n(repeat))
            return x

        state = {"x": jnp.zeros((1, t, in_dim), jnp.bfloat16), "qt": qt}
        return jax.jit(prog_fn), state, qbytes(qt), repeat

    if cfg.is_moe:
        for key in ("wqkv", "wo", "shared_g13", "shared_down"):
            if key in slw:
                progs[f"mm:{key}"] = stream_phase(key)
        folded = "shared_gate_inp" in slw and "shared_g13" not in slw \
            and "shared_down" not in slw  # weights.fold_shared_expert

        from llamatpu.models.transformer import _moe_ffn

        def moe_prog(st):
            from llamatpu.models.transformer import _index_qtensor

            slw_a = st["slw"]

            def moe_step(x, li):
                lw = jax.tree.map(
                    lambda a: _index_qtensor(a, li) if hasattr(a, "qs") else a[li],
                    slw_a, is_leaf=lambda a: hasattr(a, "qs"))
                y = _moe_ffn(cfg, x, lw, "pallas", None, slw_a, li)
                return x + y * 1e-6, None

            x, _ = jax.lax.scan(moe_step, st["x"], li_rep_n(REPEAT_MM))
            return x

        eb = 0
        for k in ("gate_exps", "up_exps", "gu_exps", "down_exps"):
            if k not in slw:
                continue
            e_tot = slw[k].qs.shape[1]
            active = cfg.n_experts_used + (e_tot - cfg.n_experts if folded else 0)
            eb += qbytes(slw[k]) // e_tot * active
        eb += sum(qbytes(slw[k]) for k in ("shared_g13", "shared_down") if k in slw)
        progs["moe_ffn(routed+shared)"] = (
            jax.jit(moe_prog),
            {"x": jnp.zeros((1, 1, cfg.dim), jnp.bfloat16), "slw": slw}, eb,
            REPEAT_MM)
    else:
        for key in ("wqkv", "wq", "wk", "wv", "wo", "w13", "w1", "w3", "w2"):
            if key in slw:
                progs[f"mm:{key}"] = stream_phase(key)

    # --- fused megakernel calls (q8_row decode: ops/layer_fused.py) — the
    # TWO pallas calls the production rowq layer actually makes, timed as
    # their own phases so PERF.md can attribute the per-call pipeline fills
    rowq_fused = (not cfg.is_moe and "wqkv" in slw and "w13" in slw
                  and getattr(slw["wqkv"], "kind", "") == "q8_row")
    if rowq_fused:
        from llamatpu.ops.layer_fused import (layer_tail_fused_rowq,
                                              qkv_norm_fused_rowq)

        def qkvf_prog(st):
            wq_, an_ = st["wqkv"], st["an"]

            def step(x, li):
                y = qkv_norm_fused_rowq(wq_, an_, x, li, cfg.rms_norm_eps)
                return x + y[..., : cfg.dim].astype(x.dtype) * 1e-6, None

            x, _ = jax.lax.scan(step, st["x"], li_rep_n(REPEAT_MM))
            return x

        progs["fused:norm+qkv"] = (
            jax.jit(qkvf_prog),
            {"x": jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
             "wqkv": slw["wqkv"], "an": slw["attn_norm"]},
            qbytes(slw["wqkv"]), REPEAT_MM)

        hdim = slw["wo"].qs.shape[-1]

        def tail_prog(st):
            wo_, w13_, w2_, fn_ = st["wo"], st["w13"], st["w2"], st["fn"]

            def step(c, li):
                x, attn = c
                y = layer_tail_fused_rowq(wo_, w13_, w2_, fn_, attn, x, li,
                                          cfg.rms_norm_eps,
                                          cfg.residual_scale)
                # keep the carry bounded over L*REPEAT steps (y ~ x + eps)
                return (x + y.astype(x.dtype) * 1e-6, attn), None

            c, _ = jax.lax.scan(step, (st["x"], st["attn"]), li_rep_n(REPEAT_MM))
            return c[0]

        progs["fused:tail(wo+ffn)"] = (
            jax.jit(tail_prog),
            {"x": jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
             "attn": jnp.ones((1, 1, hdim), jnp.bfloat16) * 0.01,
             "wo": slw["wo"], "w13": slw["w13"], "w2": slw["w2"],
             "fn": slw["ffn_norm"]},
            qbytes(slw["wo"]) + qbytes(slw["w13"]) + qbytes(slw["w2"]),
            REPEAT_MM)

    # --- decode attention (stacked-cache pallas kernel)
    kvc = eng.cache.kv  # packed [L, B, KV, S, hd+vhd]
    attn_bytes = int(L * kv * (pos + 16) * kvc.shape[-1] * kvc.dtype.itemsize)

    def attn_prog(st):
        kvc_ = st["kvc"]

        def attn_step(q4, li):
            o = decode_attention_auto(q4, kvc_, pos_vec,
                                      cfg.attn_score_scale, hd=hd,
                                      s_limit=eng.cache_len, layer_index=li)
            return (q4 + o.reshape(q4.shape) * 1e-6).astype(q4.dtype), None

        q4, _ = jax.lax.scan(attn_step, st["q4"], li_rep_n(REPEAT_CHEAP))
        return q4

    progs["attn"] = (jax.jit(attn_prog),
                     {"q4": jnp.ones((1, kv, g, hd), jnp.bfloat16) * 0.01,
                      "kvc": kvc}, attn_bytes,
                     REPEAT_CHEAP)

    # --- glue: norms + rope (no matmuls, no writes)
    cos, sin = rope_slices(W, pos_vec, 1)

    def glue_prog(st):
        an, fn, cos_, sin_ = st["an"], st["fn"], st["cos"], st["sin"]

        def glue_step(x, li):
            h = rmsnorm(x, an[li], cfg.rms_norm_eps)
            k = h[..., : kv * hd].reshape(1, 1, kv, hd)
            k = apply_rope(k, cos_, sin_, cfg.rope_style)
            h2 = rmsnorm(x, fn[li], cfg.rms_norm_eps)
            return (x + h.astype(x.dtype) * 1e-6 + h2.astype(x.dtype) * 1e-6
                    + jnp.pad(k.reshape(1, 1, -1), ((0, 0), (0, 0), (0, cfg.dim - kv * hd))).astype(x.dtype) * 1e-6), None

        x, _ = jax.lax.scan(glue_step, st["x"], li_rep_n(REPEAT_CHEAP))
        return x

    progs["glue(norm+rope)"] = (jax.jit(glue_prog),
                                {"x": jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
                                 "an": slw["attn_norm"], "fn": slw["ffn_norm"],
                                 "cos": cos, "sin": sin}, 0,
                                REPEAT_CHEAP)

    # --- KV cache writes only (packed: ONE dus per layer)
    width = hd + cfg.v_head_dim

    def writes_step(carry, li):
        x, kvc_ = carry
        kvrow = x[..., : kv * width].reshape(1, 1, kv, width)
        kvc_ = _write_rows(kvc_, kvrow.transpose(0, 2, 1, 3), li, pos_vec,
                           None, None)
        return (x, kvc_), None

    def writes_prog(carry):
        carry, _ = jax.lax.scan(writes_step, carry, li_rep_n(REPEAT_CHEAP))
        return carry

    progs["writes"] = (jax.jit(writes_prog),
                       (jnp.ones((1, 1, cfg.dim), jnp.bfloat16),
                        jnp.zeros_like(kvc)), 0,
                       REPEAT_CHEAP)

    # --- head: final norm + vocab matmul + argmax (once per token)
    from llamatpu.models.transformer import finish_logits

    def head_prog(st):
        wn = {"final_norm": st["final_norm"], "wcls": st["wcls"]}

        def head_step(x, _):
            logits = finish_logits(cfg, wn, x, "pallas", last_logit_only=True)
            nxt = jnp.argmax(logits, axis=-1)
            # fold nxt back in WITHOUT a *0 (XLA const-folds that and DCEs the
            # whole head — caught when 'head' reported 295 TB/s)
            return x + nxt[:, None, None].astype(x.dtype) * 1e-9, None

        x, _ = jax.lax.scan(head_step, st["x"], jnp.arange(REPEAT_HEAD))
        return x

    progs["head"] = (jax.jit(head_prog),
                     {"x": jnp.zeros((1, 1, cfg.dim), jnp.bfloat16),
                      "final_norm": W["final_norm"], "wcls": W["wcls"]},
                     qbytes(W["wcls"]), REPEAT_HEAD)

    # --- sampling tail: argmax + stop-token isin over a [1, V] logits buffer
    from llamatpu.ops import sampling

    def sample_prog(st):
        stops = st["stops"]

        def sample_step(lg, i):
            nxt = sampling.greedy(lg[:, 0])
            done = jnp.isin(nxt, stops).any()
            return lg + (nxt[:, None, None].astype(lg.dtype)
                         + done.astype(lg.dtype)) * 1e-9, None

        lg, _ = jax.lax.scan(sample_step, st["lg"], jnp.arange(REPEAT_CHEAP))
        return lg

    progs["sample+stop"] = (jax.jit(sample_prog),
                            {"lg": jnp.zeros((1, 1, cfg.vocab_size), jnp.float32),
                             "stops": jnp.full((8,), -1, jnp.int32)}, 0,
                            REPEAT_CHEAP)

    # --- embedding gather (+ rope row gather)
    def embed_prog(st):
        emb, rc, rs = st["emb"], st["rc"], st["rs"]

        def embed_step(tok, i):
            x = emb[tok[:, None]]
            c = rc[pos_vec[:, None] + i]
            nxt = (x[..., 0] + c[..., 0] * 1e-6).astype(jnp.int32)[:, 0] % emb.shape[0]
            return nxt, None

        tok, _ = jax.lax.scan(embed_step, st["tok"], jnp.arange(REPEAT_CHEAP))
        return tok

    progs["embed"] = (jax.jit(embed_prog),
                      {"tok": jnp.zeros((1,), jnp.int32), "emb": W["tok_emb"],
                       "rc": W["rope_cos"], "rs": W["rope_sin"]}, 0,
                      REPEAT_CHEAP)
    return progs


def run_preset(preset: str, quant: str, pack4: bool, rowq: bool = False):
    from llamatpu.models.synthetic import build_synthetic_model
    from llamatpu.runtime.engine import Engine

    label = quant + ("-pack4" if pack4 else "") + ("-rowq" if rowq else "")
    print(f"=== {preset} {label} ===", flush=True)
    t0 = time.perf_counter()
    model = build_synthetic_model(preset, quant=quant, pack4=pack4)
    print(f"  [weights built {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    eng = Engine(model, cache_len=1024, prefill_chunk=512, impl="pallas",
                 temperature=0.0, decode_window=128, rowq=rowq)
    print(f"  [engine ready {time.perf_counter()-t0:.0f}s "
          f"(upload {eng.metrics.weight_upload_s:.0f}s "
          f"compile {eng.metrics.compile_s:.0f}s)]", flush=True)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, model.cfg.vocab_size, 512).tolist()
    tok, _ = eng.prefill(prompt, 0)
    cur, pos = int(tok[0]), 512
    print("  [prefill done]", flush=True)

    # full production window, timed over 64 tokens (first rep absorbs the
    # decode program's first execution / remote-compile)
    full_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        done = 0
        while done < ITERS:
            w = eng.decode_window_run(cur, pos, ITERS - done)
            cur, pos, done = w[-1], pos + len(w), done + len(w)
        full_s = min(full_s, (time.perf_counter() - t0) / ITERS)
        if pos > 900:
            eng.reset()
            tok, _ = eng.prefill(prompt, 0)
            cur, pos = int(tok[0]), 512
    print(f"  full window: {full_s*1e3:.3f} ms/tok ({1/full_s:.1f} tok/s)",
          flush=True)

    # dispatch+fetch floor (relay RTT): an (almost) empty jitted program,
    # timed the same way — subtracted from every phase dispatch
    tiny = jax.jit(lambda x: x + 1.0)
    rtt = timed(tiny, jnp.zeros((8, 128), jnp.float32), 1)
    print(f"  [dispatch+fetch floor: {rtt*1e3:.1f} ms]", flush=True)

    rows = [{"phase": "full", "ms": full_s * 1e3, "gbs": None,
             "dispatch_floor_ms": rtt * 1e3}]
    total_parts = 0.0
    for name, (prog, state, nbytes, rep) in phase_programs(eng, 512).items():
        print(f"  [{name}: tracing+compiling...]", flush=True)
        s = max(timed(prog, state, rep) - rtt / rep, 0.0)
        total_parts += s
        rows.append({"phase": name, "ms": s * 1e3,
                     "gbs": (nbytes / s / 1e9) if nbytes else None,
                     "bytes_per_tok": nbytes or None})
        print(f"  {name:22s} {s*1e3:7.3f} ms/tok"
              + (f"  {nbytes/s/1e9:6.1f} GB/s ({nbytes/1e6:.0f} MB/tok)" if nbytes else ""),
              flush=True)
    resid = full_s * 1e3 - total_parts * 1e3
    rows.append({"phase": "residual(full-parts)", "ms": resid, "gbs": None})
    print(f"  {'full':22s} {full_s*1e3:7.3f} ms/tok  ({1/full_s:.1f} tok/s)")
    print(f"  {'residual':22s} {resid:7.3f} ms/tok", flush=True)
    return {"preset": preset, "quant": label, "tok_s": 1 / full_s, "rows": rows}


# v5e peaks for MFU accounting (prefill is compute-bound, decode HBM-bound)
PEAK_BF16_FLOPS = 197e12
PEAK_INT8_OPS = 394e12
REPEAT_PF = 24  # prefill GEMM passes per dispatch (each pass ~0.3-3 ms)


def run_prefill(preset: str, quant: str, pack4: bool, rowq: bool = False):
    """Prefill roofline (VERDICT r3 #5): full pp512 wall time + per-projection
    GEMM phases at T=512 with TFLOP/s and MFU vs the MXU peak (int8 peak for
    the rowq w8a8 path, bf16 otherwise). Non-GEMM prefill work (causal
    attention, norms/rope, KV writes, sampling) lands in the residual."""
    from llamatpu.models.synthetic import build_synthetic_model
    from llamatpu.runtime.engine import Engine

    label = quant + ("-pack4" if pack4 else "") + ("-rowq" if rowq else "")
    print(f"=== PREFILL {preset} {label} ===", flush=True)
    model = build_synthetic_model(preset, quant=quant, pack4=pack4)
    eng = Engine(model, cache_len=1024, prefill_chunk=512, impl="pallas",
                 temperature=0.0, decode_window=16, rowq=rowq)
    print(f"  [engine ready (compile {eng.metrics.compile_s:.0f}s)]", flush=True)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, model.cfg.vocab_size, 512).tolist()
    full_s = float("inf")
    for _ in range(3):
        eng.reset()
        t0 = time.perf_counter()
        tok, _ = eng.prefill(prompt, 0)
        _ = int(tok[0])
        full_s = min(full_s, time.perf_counter() - t0)
    print(f"  full pp512: {full_s*1e3:.1f} ms ({512/full_s:.0f} tok/s)", flush=True)

    tiny = jax.jit(lambda x: x + 1.0)
    rtt = timed(tiny, jnp.zeros((8, 128), jnp.float32), 1)

    rows = [{"phase": "full_pp512", "ms": full_s * 1e3,
             "tok_s": 512 / full_s, "dispatch_floor_ms": rtt * 1e3}]
    total_parts = 0.0
    peak = PEAK_INT8_OPS if rowq else PEAK_BF16_FLOPS
    builders = _prefill_gemm_builders(eng)
    for name, (prog, state, flops, rep) in builders.items():
        print(f"  [{name}: tracing+compiling...]", flush=True)
        s = max(timed(prog, state, rep) - rtt / rep, 0.0)
        total_parts += s
        rows.append({"phase": name, "ms": s * 1e3,
                     "tflops": flops / s / 1e12, "mfu": flops / s / peak})
        print(f"  {name:22s} {s*1e3:7.3f} ms/chunk  {flops/s/1e12:6.1f} TFLOP/s"
              f"  MFU {flops/s/peak:5.1%}", flush=True)
    # head runs once per chunk (logit_index)
    resid = full_s * 1e3 - total_parts * 1e3
    rows.append({"phase": "residual(attn+glue+head+writes)", "ms": resid})
    print(f"  residual (attn+glue+head+writes): {resid:.1f} ms", flush=True)
    return {"preset": preset, "quant": label, "mode": "prefill",
            "pp512_tok_s": 512 / full_s, "rows": rows}


def _prefill_gemm_builders(eng):
    """Per-projection T=512 GEMM programs via phase_programs' stream builder,
    with flop accounting."""
    from llamatpu.models.weights import QTensor
    from llamatpu.ops.matmul import matmul

    cfg = eng.cfg
    slw = eng.weights["layers"]
    L = cfg.n_layers
    out = {}
    t = 512
    for key in ("wqkv", "wq", "wk", "wv", "wo", "w13", "w1", "w3", "w2"):
        qt = slw.get(key)
        if not isinstance(qt, QTensor):
            continue
        in_dim = qt.qs.shape[-1] * (2 if qt.layout == "packed4" else 1)
        if qt.kind == "q8_row":
            in_dim = qt.qs.shape[-1]
        o_dim = qt.qs.shape[-2]

        def prog_fn(st, _in=in_dim):
            def step(x, li):
                y = matmul(st["qt"], x, "pallas", li=li)
                o = y.shape[-1]
                if o >= _in:
                    return x + y[..., :_in].astype(x.dtype) * 1e-6, None
                return x + jnp.pad(
                    y, ((0, 0), (0, 0), (0, _in - o))).astype(x.dtype) * 1e-6, None

            x, _ = jax.lax.scan(
                step, st["x"],
                jnp.tile(jnp.arange(L, dtype=jnp.int32), REPEAT_PF))
            return x

        state = {"x": jnp.full((1, t, in_dim), 0.01, jnp.bfloat16), "qt": qt}
        flops = 2 * t * o_dim * in_dim  # per layer-pass
        out[f"gemm:{key}"] = (jax.jit(prog_fn), state, flops, REPEAT_PF)
    return out


def main():
    prefill = "--prefill" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--prefill"]
    targets = [("llama32-1b", "q8_0", False, False)]
    if argv:
        preset = argv[0]
        quant = argv[1] if len(argv) > 1 else "q8_0"
        rowq = quant.endswith("-rowq")
        quant = quant.replace("-rowq", "")
        pack4 = quant.endswith("-pack4")
        quant = quant.replace("-pack4", "")
        targets = [(preset, quant, pack4, rowq)]
    fn = run_prefill if prefill else run_preset
    out = [fn(*t) for t in targets]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
