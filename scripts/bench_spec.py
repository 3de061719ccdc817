#!/usr/bin/env python3
"""Speculative-decoding bench row: step-cost overhead + acceptance telemetry.

Prompt-lookup drafting wins on text that repeats its own history (code,
boilerplate). On a random-weight synthetic model the GENERATED continuation is
not self-repeating, so acceptance on free generation is the floor (~0) — the
row that matters here is the verify-forward OVERHEAD (a T=1+K forward reads
the same weight bytes as T=1 on a bandwidth-bound chip, so accepted drafts are
nearly free). Acceptance-rate itself is exercised hermetically in
tests/test_spec_decode.py with a crafted repeating history; real-text
acceptance needs a real checkpoint (egress-blocked, BASELINE.md).

  python scripts/bench_spec.py [preset] [K]    (default llama32-1b 8)

Two JSON lines: baseline greedy tok/s and spec-decode tok/s + accept rate.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def run(eng, prompt, tg):
    import numpy as np

    tok, _ = eng.prefill(prompt, 0)
    cur, pos = int(tok[0]), len(prompt)
    eng.decode_window_run(cur, pos, 8)  # absorb first-execution
    eng.reset()
    tok, _ = eng.prefill(prompt, 0)
    cur, pos = int(tok[0]), len(prompt)
    n = 0
    t0 = time.perf_counter()
    while n < tg:
        w = eng.decode_window_run(cur, pos, tg - n)
        if not w:
            break
        cur, pos, n = w[-1], pos + len(w), n + len(w)
    return n, time.perf_counter() - t0


def main() -> int:
    import numpy as np

    from llamatpu.models.synthetic import build_synthetic_model
    from llamatpu.runtime.engine import Engine

    preset = sys.argv[1] if len(sys.argv) > 1 else "llama32-1b"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tg = 128
    model = build_synthetic_model(preset, quant="q8_0", context_length=1024)
    rng = np.random.default_rng(42)
    # code-like prompt: a short vocabulary slice tiled with jitter, so the
    # n-gram lookup has real bigram repeats to draft from
    base = rng.integers(0, model.cfg.vocab_size, 32)
    prompt = []
    while len(prompt) < 512:
        prompt.extend(int(t) for t in base)
    prompt = prompt[:512]

    for spec in (0, k):
        eng = Engine(model, cache_len=1024, prefill_chunk=512, temperature=0.0,
                     decode_window=32, impl="pallas", spec_decode=spec)
        n, dt = run(eng, prompt, tg)
        row = {"bench": "spec-decode", "model": preset, "K": spec,
               "decode_tok_s": round(n / dt, 1), "tg": n}
        if spec:
            row["spec_accept_rate"] = eng.metrics.extra.get("spec_accept_rate")
            row["spec_forwards"] = eng.metrics.extra.get("spec_forwards")
        print(json.dumps(row), flush=True)
        del eng
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
