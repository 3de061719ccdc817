"""llama-bench style benchmark matrix.

Parity with the reference's LlamaBench (bench/LlamaBench.java:50-354): test
specs pp N (prompt processing), tg N (token generation), pg N+M, depth -d
(untimed KV prefill before the timed window), warmup + reps with avg±stddev,
md/csv/json/jsonl/sql output. Timings cover the forward path only (synthetic
random tokens, seed 42; no tokenizer/sampler in the timed window — sampling is
fused into the decode program on TPU, so it is included there and costs ~0).
"""
from __future__ import annotations

import json
import statistics
import time
from dataclasses import dataclass

import numpy as np


@dataclass
class BenchResult:
    test: str          # "pp512" | "tg128" | "pp512+tg128@d256"
    n_tokens: int
    avg_s: float
    std_s: float

    @property
    def tok_s(self) -> float:
        return self.n_tokens / self.avg_s if self.avg_s > 0 else 0.0

    @property
    def tok_s_std(self) -> float:
        if self.avg_s <= 0:
            return 0.0
        return self.tok_s * (self.std_s / self.avg_s)


def _rand_tokens(n: int, vocab: int, seed: int = 42) -> list[int]:
    return np.random.default_rng(seed).integers(0, vocab, n).tolist()


def bench_pp(engine, n: int, depth: int, reps: int, warmup: int = 1) -> BenchResult:
    toks = _rand_tokens(n, engine.cfg.vocab_size)
    depth_toks = _rand_tokens(depth, engine.cfg.vocab_size, seed=7) if depth else []
    times = []
    for rep in range(warmup + reps):
        engine.reset()
        if depth:
            engine.prefill(depth_toks, 0)
        t0 = time.perf_counter()
        tok, _ = engine.prefill(toks, depth)
        int(tok[0])  # block
        dt = time.perf_counter() - t0
        if rep >= warmup:
            times.append(dt)
    return BenchResult(f"pp{n}" + (f"@d{depth}" if depth else ""), n,
                       statistics.mean(times), statistics.pstdev(times))


def bench_tg(engine, n: int, depth: int, reps: int, warmup: int = 1) -> BenchResult:
    """Autoregressive decode via device-side windows (engine.decode_window_run)
    — the production decode path. A per-token decode_step loop measures the
    host<->device round trip instead (one ~30 ms relay RTT per token on this
    chip, capping every model at ~30 tok/s); that is NOT how the engine
    decodes, so the tool reported numbers its own `run` command beat 10x."""
    vocab = engine.cfg.vocab_size
    depth_toks = _rand_tokens(max(depth, 1), vocab, seed=7)
    times = []
    generated = n
    for rep in range(warmup + reps):
        engine.reset()
        tok, _ = engine.prefill(depth_toks, 0)  # untimed: establishes pos
        cur, pos = int(tok[0]), len(depth_toks)
        t0 = time.perf_counter()
        done = 0
        while done < n:
            w = engine.decode_window_run(cur, pos, n - done)
            if not w:
                break
            cur = w[-1]
            pos += len(w)
            done += len(w)
        dt = time.perf_counter() - t0
        if rep >= warmup:
            times.append(dt)
            generated = done
    if generated < n:
        # Cache/context exhausted mid-window (e.g. depth + n > context_length):
        # report the tokens actually decoded so tok/s isn't inflated (advisor r2).
        import warnings
        warnings.warn(f"tg{n}@d{depth}: only {generated} tokens fit the cache; "
                      "reporting actual count", stacklevel=2)
    return BenchResult(f"tg{n}" + (f"@d{depth}" if depth else ""), generated,
                       statistics.mean(times), statistics.pstdev(times))


def bench_pg(engine, p: int, t: int, reps: int, warmup: int = 1) -> BenchResult:
    """Combined prompt+generation window (reference `pg p+t` spec,
    LlamaBench.java): timed prefill of p tokens followed by t decoded tokens."""
    toks = _rand_tokens(p, engine.cfg.vocab_size)
    times = []
    generated = t
    for rep in range(warmup + reps):
        engine.reset()
        t0 = time.perf_counter()
        tok, _ = engine.prefill(toks, 0)
        cur = int(tok[0])
        pos, n = p, 0
        while n < t:
            w = engine.decode_window_run(cur, pos, t - n)
            if not w:
                break
            cur = w[-1]
            pos += len(w)
            n += len(w)
        dt = time.perf_counter() - t0
        if rep >= warmup:
            times.append(dt)
            generated = n
    return BenchResult(f"pg{p}+{t}", p + generated,
                       statistics.mean(times), statistics.pstdev(times))


def bench_tg_batch(batch_engine, n: int, depth: int, reps: int, warmup: int = 1) -> BenchResult:
    """Aggregate batched decode throughput: B lanes decode n tokens each
    (the reference's static-batched-decode claim, README.md:74)."""
    B = batch_engine.batch_size
    vocab = batch_engine.cfg.vocab_size
    prompts = [_rand_tokens(max(depth, 4), vocab, seed=100 + b) for b in range(B)]
    times = []
    for rep in range(warmup + reps):
        t0 = time.perf_counter()
        outs = batch_engine.generate_batch(prompts, n)
        dt = time.perf_counter() - t0
        if rep >= warmup:
            times.append(dt)
    total = B * n
    return BenchResult(f"tg{n}@b{B}", total, statistics.mean(times), statistics.pstdev(times))


def render(results: list[BenchResult], fmt: str, model_name: str, quant: str) -> str:
    rows = [
        {"model": model_name, "quant": quant, "test": r.test, "n": r.n_tokens,
         "avg_s": round(r.avg_s, 4), "std_s": round(r.std_s, 4),
         "tok_s": round(r.tok_s, 2), "tok_s_std": round(r.tok_s_std, 2)}
        for r in results
    ]
    if fmt == "json":
        return json.dumps(rows, indent=2)
    if fmt == "jsonl":
        return "\n".join(json.dumps(r) for r in rows)
    if fmt == "csv":
        hdr = "model,quant,test,n,avg_s,std_s,tok_s,tok_s_std"
        return hdr + "\n" + "\n".join(
            f'{r["model"]},{r["quant"]},{r["test"]},{r["n"]},{r["avg_s"]},{r["std_s"]},{r["tok_s"]},{r["tok_s_std"]}'
            for r in rows)
    if fmt == "sql":
        stmts = ["CREATE TABLE IF NOT EXISTS bench(model TEXT, quant TEXT, test TEXT, "
                 "n INT, avg_s REAL, std_s REAL, tok_s REAL, tok_s_std REAL);"]
        for r in rows:
            stmts.append(
                "INSERT INTO bench VALUES("
                f"'{r['model']}','{r['quant']}','{r['test']}',{r['n']},"
                f"{r['avg_s']},{r['std_s']},{r['tok_s']},{r['tok_s_std']});")
        return "\n".join(stmts)
    # md (default)
    out = ["| model | quant | test | tok/s |", "|---|---|---|---|"]
    for r in rows:
        out.append(f"| {r['model']} | {r['quant']} | {r['test']} | "
                   f"{r['tok_s']:.2f} ± {r['tok_s_std']:.2f} |")
    return "\n".join(out)


def run_bench(args) -> None:
    import jax.numpy as jnp

    from llamatpu.models.loader import load_model
    from llamatpu.runtime.engine import Engine

    model = load_model(args.model, max_tokens=0, load_tokenizer=False)
    need = max([p + d for p in args.pp for d in args.depth]
               + [t + d + 1 for t in args.tg for d in args.depth])
    cache_len = min(model.cfg.context_length, max(need, 256))
    from llamatpu.cli import _cache_dtype

    engine = Engine(model, cache_len=cache_len, impl=args.impl,
                    prefill_chunk=args.prefill_chunk, temperature=0.0,
                    cache_dtype=_cache_dtype(args),
                    rowq=getattr(args, "rowq", False))
    results = []
    for d in args.depth:
        for p in args.pp:
            results.append(bench_pp(engine, p, d, args.reps))
        for t in args.tg:
            results.append(bench_tg(engine, t, d, args.reps))
    for spec in getattr(args, "pg", []) or []:
        p, t = (int(x) for x in spec.split("+"))
        results.append(bench_pg(engine, p, t, args.reps))
    if getattr(args, "batch", 1) > 1:
        from llamatpu.runtime.batch_engine import BatchEngine

        be = BatchEngine(model, batch_size=args.batch, cache_len=cache_len,
                         impl=args.impl, prefill_chunk=args.prefill_chunk,
                         cache_dtype=_cache_dtype(args),
                         rowq=getattr(args, "rowq", False))
        for t in args.tg:
            results.append(bench_tg_batch(be, t, max(args.depth), args.reps))
    name = model.metadata.get("general.name", "unknown")
    print(render(results, args.output, name, model.quant_label))
