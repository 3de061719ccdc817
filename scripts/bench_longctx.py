#!/usr/bin/env python3
"""Long-context decode rows: tok/s at deep KV (16k/32k) — exercises the
DMA-clamped splitKV decode-attention path at depth (ops/pallas_attention.py)
where the weight-stream-bound shallow-decode numbers no longer tell the story.

  python scripts/bench_longctx.py [preset] [quant] [ctx,ctx,...]
  (default llama32-1b q8_0 16384,32768)

One JSON line per ctx (appendable to docs/perf-history.jsonl).
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import numpy as np

    from llamatpu.models.synthetic import build_synthetic_model
    from llamatpu.runtime.engine import Engine

    preset = sys.argv[1] if len(sys.argv) > 1 else "llama32-1b"
    quant = sys.argv[2] if len(sys.argv) > 2 else "q8_0"
    ctxs = ([int(c) for c in sys.argv[3].split(",")] if len(sys.argv) > 3
            else [16384, 32768])
    tg = 64
    for ctx in ctxs:
        print(f"# ctx={ctx}: building...", file=sys.stderr, flush=True)
        model = build_synthetic_model(preset, quant=quant,
                                      context_length=ctx + 256)
        eng = Engine(model, cache_len=ctx + 256, prefill_chunk=512,
                     temperature=0.0, decode_window=64, impl="pallas")
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, model.cfg.vocab_size, ctx).tolist()
        print(f"# ctx={ctx}: prefilling {ctx} tokens...", file=sys.stderr,
              flush=True)
        t0 = time.perf_counter()
        tok, _ = eng.prefill(prompt, 0)
        cur = int(tok[0])
        pp_s = time.perf_counter() - t0
        # warm decode window (first execution absorbs remote program load)
        w = eng.decode_window_run(cur, ctx, 8)
        cur, pos = w[-1], ctx + len(w)
        t0 = time.perf_counter()
        n = 0
        while n < tg:
            w = eng.decode_window_run(cur, pos, tg - n)
            if not w:
                break
            cur, pos, n = w[-1], pos + len(w), n + len(w)
        tg_s = time.perf_counter() - t0
        row = {"bench": "long-context", "model": preset, "quant": quant,
               "depth": ctx, "decode_tok_s": round(n / tg_s, 1),
               "prefill_tok_s": round(ctx / pp_s, 1), "tg": n}
        print(json.dumps(row), flush=True)
        del eng, model
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
