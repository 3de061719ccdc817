#!/bin/bash
# Round-5 final chip session: verify CLI drive on the current tree, the
# bf16-vs-int8 GEMM bisect, and one attempt at the grouped-kernel MoE parity
# with the FIXED f32 VMEM multipliers (171b93a).
#   nohup scripts/run_artifacts_r5d.sh [wait_pid] > /tmp/artifacts_r5d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
H=scripts/append_perf_history.py
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != 0 ]; then
  echo "waiting for pid $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "previous session done at $(date -u +%H:%M:%S); settling 60s"
  sleep 60
fi

step() { echo "##### $(date -u +%H:%M:%S) STEP: $* #####"; }
hist() { while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' "$1"); }

step cli-verify   # /verify surface against the final tree
$R 2 1200 python -m llamatpu.cli run --model /tmp/tiny_llama.gguf \
  --prompt "hello world" --temperature 0 -n 32

step gemm-bf16    # bisect the low int8 MFU: in-kernel bf16-cast variant
$R 2 3000 python scripts/bench_gemm.py 512 | tee /tmp/gemm_bf16.jsonl
hist /tmp/gemm_bf16.jsonl

step parity-moe-grouped  # rung 1 with the fixed f32 VMEM fit
$R 1 3000 python - <<'PYEOF'
import sys, json
sys.path.insert(0, ".")
from llamatpu.bench.parity import parity_table
rows = parity_table("qwen15-moe-a2.7b", corpus_len=128, cache_len=128,
                    seed=0, variants=("f32", "q8_0", "q8_row"),
                    chunk=8, n_layers=2)
print(json.dumps({"bench": "parity-moe", "model": "qwen15-moe-a2.7b",
                  "path": "pallas-chunk8-fixedfit", "n_layers": 2,
                  "rows": rows}), flush=True)
PYEOF

step done-all
