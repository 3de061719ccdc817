#!/bin/bash
# Round-5 chip session A: validate the packed-KV cache + megakernel-v3 VMEM
# fix on the real chip, refresh the headline bench, re-measure long context,
# and re-run the spec-decode pair back-to-back (advisor r4 #3).
#   nohup scripts/run_artifacts_r5a.sh > /tmp/artifacts_r5a.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
H=scripts/append_perf_history.py
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step() { echo "##### $(date -u +%H:%M:%S) STEP: $* #####"; }
hist() { while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' "$1"); }

step cli-smoke  # /verify surface: tiny model end-to-end on chip (packed KV)
$R 2 2400 python -m llamatpu.cli run --model /tmp/tiny_llama.gguf \
  --prompt "hello world" --temperature 0 -n 32

step fused-smoke  # packed fused append (full + int8) decode parity on chip
$R 2 2400 python - <<'EOF'
import sys
sys.path.insert(0, ".")
import os
import numpy as np
from llamatpu.models.synthetic import build_synthetic_model
from llamatpu.runtime.engine import Engine

model = build_synthetic_model("qwen3-0.6b", quant="q8_0", context_length=512)
outs = {}
for tag, env in (("fused", None), ("unfused", "1")):
    if env: os.environ["LLAMATPU_NO_FUSED_ATTN"] = env
    else: os.environ.pop("LLAMATPU_NO_FUSED_ATTN", None)
    eng = Engine(model, cache_len=512, prefill_chunk=128, temperature=0.0,
                 decode_window=32, impl="pallas", aot_compile=True)
    r = eng.generate(list(range(1, 65)), 48)
    outs[tag] = r.tokens
    print(tag, "ok", len(r.tokens), flush=True)
    del eng
assert outs["fused"] == outs["unfused"], (outs["fused"][:8], outs["unfused"][:8])
print("FUSED-SMOKE PARITY OK (packed)", flush=True)
EOF

step mega-smoke   # megakernel v3 on chip: VMEM fix + packed phase A —
                  # parity + rate vs v2 (r4c attempt OOMed at 17.54M)
$R 2 3000 python - <<'PYEOF'
import os, sys, time
sys.path.insert(0, ".")
import json
import numpy as np
from llamatpu.models.synthetic import build_synthetic_model
from llamatpu.runtime.engine import Engine

model = build_synthetic_model("llama32-1b", quant="q8_0", context_length=1024)
outs = {}
rates = {}
for tag, env in (("mega", "1"), ("v2", None)):
    if env: os.environ["LLAMATPU_ATTN_TAIL"] = env
    else: os.environ.pop("LLAMATPU_ATTN_TAIL", None)
    eng = Engine(model, cache_len=1024, prefill_chunk=512, temperature=0.0,
                 decode_window=128, impl="pallas", aot_compile=True, rowq=True)
    prompt = np.random.default_rng(42).integers(0, model.cfg.vocab_size, 512).tolist()
    eng.reset(); eng.generate(prompt, 8); eng.reset()
    tok, _ = eng.prefill(prompt, 0)
    cur, pos, n = int(tok[0]), 512, 0
    t0 = time.perf_counter()
    toks = [cur]
    while n < 128:
        w = eng.decode_window_run(cur, pos, 128 - n)
        if not w: break
        toks += w; cur, pos, n = w[-1], pos + len(w), n + len(w)
    dt = time.perf_counter() - t0
    outs[tag], rates[tag] = toks, 128 / dt
    print(f"{tag}: {128/dt:.1f} tok/s", flush=True)
    del eng
print(json.dumps({"bench": "mega-smoke", "model": "llama32-1b",
                  "quant": "q8_0r", "mega_tok_s": round(rates["mega"], 1),
                  "v2_tok_s": round(rates["v2"], 1),
                  "tokens_match": outs["mega"] == outs["v2"]}), flush=True)
PYEOF

step bench        # headline (packed KV; v2 path unless ATTN_TAIL defaulted)
$R 3 3000 python bench.py | tee /tmp/bench_r5a.json
grep '^{' /tmp/bench_r5a.json | python $H /dev/stdin

step longctx      # packed stripe: 16k/32k re-measure (was 203.8 / 157.7)
$R 2 5400 python scripts/bench_longctx.py llama32-1b q8_0 16384,32768 \
  > /tmp/longctx_r5a.jsonl && hist /tmp/longctx_r5a.jsonl

step spec-pair    # advisor r4 #3: K=0 and K=8 back-to-back post-warmup
$R 2 3000 python scripts/bench_spec.py llama32-1b 8 > /tmp/spec_r5a.jsonl \
  && hist /tmp/spec_r5a.jsonl

step decode-phases  # updated launch-residual + packed attn/writes reading
$R 2 3600 python scripts/perf_phases.py llama32-1b q8_0-rowq > /tmp/pp_r5a.json 2>/tmp/pp_r5a.log

step probe        # packed splitKV stream rate at depth (was 5.95 ms/step)
$R 2 2700 python scripts/probe_longctx_r5.py

step done-all
