#!/usr/bin/env python3
"""Full model-matrix benchmark: decode/prefill throughput per synthetic preset
(exact production geometry) — the analog of the reference's per-model CI rows
in docs/perf-history.jsonl (BASELINE.md table).

Usage: python scripts/bench_matrix.py [preset ...]   (default: headline set)
"""
import json
import sys
import time

sys.path.insert(0, ".")


def bench_preset(name: str, quant: str = "q8_0", pp: int = 512, tg: int = 128):
    """Preset may carry a quant suffix, e.g. llama3-8b:q4_0 or :q4_0p
    (trailing p = packed nibbles, half HBM; trailing r = --rowq per-row int8
    serving format, q8_0 only)."""
    if ":" in name:
        name, quant = name.split(":")
    pack4 = quant.endswith("p")
    if pack4:
        quant = quant[:-1]
    rowq = quant.endswith("r")
    if rowq:
        quant = quant[:-1]
    import numpy as np

    from llamatpu.models.synthetic import build_synthetic_model
    from llamatpu.runtime.engine import Engine

    print(f"# {name}: building weights...", file=sys.stderr, flush=True)
    model = build_synthetic_model(name, quant=quant, context_length=1024,
                                  pack4=pack4)
    print(f"# {name}: engine init (upload + compile)...", file=sys.stderr, flush=True)
    engine = Engine(model, cache_len=1024, prefill_chunk=512, temperature=0.0,
                    decode_window=128, impl="pallas", aot_compile=True,
                    rowq=rowq)
    print(f"# {name}: benching...", file=sys.stderr, flush=True)
    rng = np.random.default_rng(42)
    prompt = rng.integers(0, model.cfg.vocab_size, pp).tolist()
    engine.reset()
    engine.generate(prompt[:pp], 8)  # warm
    engine.reset()
    t0 = time.perf_counter()
    tok, _ = engine.prefill(prompt, 0)
    first = int(tok[0])
    pp_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n, tok_v, pos = 0, first, pp
    while n < tg:
        w = engine.decode_window_run(tok_v, pos, tg - n)
        if not w:
            break
        tok_v = w[-1]
        pos += len(w)
        n += len(w)
    tg_s = time.perf_counter() - t0
    del engine
    return {"model": name, "quant": quant + ("p" if pack4 else "") + ("r" if rowq else ""),
            "decode_tok_s": round(n / tg_s, 1),
            "prefill_tok_s": round(pp / pp_s, 1)}


def main() -> int:
    # default matrix covers the HBM-stressing large models too (q4_0p = packed
    # nibbles), so perf-history guards the rows that regress under memory
    # pressure, not just the small presets
    presets = sys.argv[1:] or ["llama32-1b", "qwen3-0.6b", "qwen25-1.5b",
                               "phi3-mini", "granite-3.2-2b",
                               "llama3-8b:q4_0p", "mistral-7b:q4_0p",
                               "qwen15-moe-a2.7b:q4_0p"]
    rows = []
    for p in presets:
        try:
            row = bench_preset(p)
        except Exception as e:  # keep the matrix going
            row = {"model": p, "error": str(e)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
