#!/bin/bash
# Round-4 session-2 follow-up chip run (waits for run_artifacts_r4b.sh to
# release the single-client relay): validate + measure the fused KV-append
# attention kernel, refresh the driver bench row, re-run the decode phase
# breakdown, and A/B the w2 tail layout.
#   nohup scripts/run_artifacts_r4c.sh <r4b_pid> > /tmp/artifacts_r4c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
H=scripts/append_perf_history.py

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != 0 ]; then
  echo "waiting for pid $WAIT_PID (r4b artifact run) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "r4b done at $(date -u +%H:%M:%S); settling 60s for the relay grant"
  sleep 60
fi

step() { echo "##### $(date -u +%H:%M:%S) STEP: $* #####"; }
hist() { while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' "$1"); }

step fused-smoke  # tiny-preset decode, fused vs unfused bit parity on chip
$R 2 2400 python - <<'EOF'
import sys, time
sys.path.insert(0, ".")
import numpy as np
from llamatpu.models.synthetic import build_synthetic_model
from llamatpu.runtime.engine import Engine

model = build_synthetic_model("qwen3-0.6b", quant="q8_0", context_length=512)
import os
outs = {}
for tag, env in (("fused", None), ("unfused", "1")):
    if env: os.environ["LLAMATPU_NO_FUSED_ATTN"] = env
    else: os.environ.pop("LLAMATPU_NO_FUSED_ATTN", None)
    eng = Engine(model, cache_len=512, prefill_chunk=128, temperature=0.0,
                 decode_window=32, impl="pallas", aot_compile=True)
    r = eng.generate(list(range(1, 65)), 48)
    outs[tag] = r.tokens
    print(tag, "ok", len(r.tokens), flush=True)
assert outs["fused"] == outs["unfused"], (outs["fused"][:8], outs["unfused"][:8])
print("FUSED-SMOKE PARITY OK", flush=True)
EOF

step bench-fused  # driver bench with the fused attention kernel
$R 3 3000 python bench.py | tee /tmp/bench_r04c.json
grep '^{' /tmp/bench_r04c.json | python $H /dev/stdin

step decode-phases-fused  # updated launch-residual reading
$R 2 3600 python scripts/perf_phases.py llama32-1b q8_0-rowq > /tmp/pp_fused.json 2>/tmp/pp_fused.log

step sweep-tail   # w2 contraction-tiled A/B (PERF.md next-lever #1)
$R 2 3600 python scripts/sweep_tail.py llama32-1b > /tmp/sweep_tail.json 2>/tmp/sweep_tail.log

step done
