#!/usr/bin/env python3
"""Serving latency matrix: TTFT / inter-token p50/p99 / adversary stalls /
prefix-cache warm TTFT through the continuous batcher, dense and paged.

  python scripts/bench_serving.py [preset] [quant] [batches]
  (default llama32-1b q8_0 8,16,32; batches e.g. "16" to trim compile cost —
  each engine config is its own set of remote compiles, 10-25 min apiece on
  the 2026-08-21 relay)

Emits one JSON line per scenario (appendable to docs/perf-history.jsonl)."""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax.numpy as jnp

    from llamatpu.bench.serving_latency import run_latency_bench
    from llamatpu.models.synthetic import build_synthetic_model
    from llamatpu.runtime.batch_engine import BatchEngine
    from llamatpu.runtime.paged_engine import PagedBatchEngine

    preset = sys.argv[1] if len(sys.argv) > 1 else "llama32-1b"
    quant = sys.argv[2] if len(sys.argv) > 2 else "q8_0"
    batches = tuple(int(b) for b in sys.argv[3].split(",")) if len(sys.argv) > 3 \
        else (8, 16, 32)
    pack4 = quant.endswith("p")
    rowq = quant.rstrip("p").endswith("r")  # e.g. q8_0r: rowq serving format
    base = quant.rstrip("p").rstrip("r").rstrip("_") if rowq else quant.rstrip("p")
    base = "q8_0" if rowq else base
    model = build_synthetic_model(preset, quant=base,
                                  context_length=2048, pack4=pack4)
    impl = "pallas"
    for B in batches:
        for paged in (False, True):
            if paged:
                eng = PagedBatchEngine(model, batch_size=B, block_size=32,
                                       max_len=2048, impl=impl, decode_window=8,
                                       prefill_chunk=256, rowq=rowq)
            else:
                eng = BatchEngine(model, batch_size=B, cache_len=2048, impl=impl,
                                  decode_window=8, prefill_chunk=256, rowq=rowq)
            row = run_latency_bench(eng, n_requests=2 * B, prompt_len=128,
                                    max_new=64, adversary_prompt_len=1024)
            row = {"bench": "serving-latency", "model": preset, "quant": quant,
                   "batch": B, "paged": paged, **row}
            print(json.dumps(row), flush=True)
            del eng
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
