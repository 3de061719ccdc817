#!/usr/bin/env python3
"""MoE production-geometry parity (the r4 blocker): the chunk-16 grouped ppl
program kills the axon remote-compile helper, so this runs an escalation
ladder and reports which rung landed:

  1. grouped pallas kernels at chunk 8 (smaller per-call grids)
  2. grouped pallas at chunk 4
  3. impl="xla" at chunk 16 — same quantized VALUES through the dequant
     path: pins FORMAT fidelity at production expert geometry; the grouped
     kernels stay gated by the reduced-geometry CI shapes

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/run_parity_moe.py

Emits one JSON line with the rows + the rung that succeeded (appendable to
docs/perf-history.jsonl; PARITY.md references it).
"""
import json
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

VARIANTS = ("f32", "q8_0", "q4_0-pack4", "q4_k", "q8_row")


def main() -> int:
    from llamatpu.bench.parity import parity_table

    ladder = [
        {"chunk": 8, "force_impl": None, "tag": "pallas-chunk8"},
        {"chunk": 4, "force_impl": None, "tag": "pallas-chunk4"},
        {"chunk": 16, "force_impl": "xla", "tag": "xla-chunk16"},
    ]
    for rung in ladder:
        tag = rung.pop("tag")
        print(f"# trying {tag}...", file=sys.stderr, flush=True)
        try:
            rows = parity_table("qwen15-moe-a2.7b", corpus_len=256,
                                cache_len=256, seed=0, variants=VARIANTS,
                                n_layers=2, **rung)
            print(json.dumps({"bench": "parity-moe", "model": "qwen15-moe-a2.7b",
                              "path": tag, "n_layers": 2, "rows": rows}),
                  flush=True)
            return 0
        except Exception:
            traceback.print_exc()
            print(f"# {tag} failed; next rung", file=sys.stderr, flush=True)
    print(json.dumps({"bench": "parity-moe", "error": "all rungs failed"}),
          flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
