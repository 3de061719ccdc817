#!/bin/bash
# Round-4 session-2 TPU artifact run: ONLY the rows still missing from
# docs/perf-history.jsonl (serving TTFT/ITG, MoE post-restructure decode,
# spec-decode, 16k longctx, MoE phase breakdown). Priority order so a dying
# session still lands the verdict-critical rows first.
#   nohup scripts/run_artifacts_r4b.sh > /tmp/artifacts_r4b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
H=scripts/append_perf_history.py

step() { echo "##### $(date -u +%H:%M:%S) STEP: $* #####"; }
hist() { while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' "$1"); }

step moe-bench    # MoE decode row post sort-free routing + fused gu stacks
                  # (VERDICT #4: target >=250; r2 row was 174.9).
                  # 14.3B q4_0p only fits the 16G chip UNFOLDED (STATUS gap 8).
LLAMATPU_NO_SHARED_FOLD=1 $R 3 3600 python scripts/bench_matrix.py qwen15-moe-a2.7b:q4_0p \
  > /tmp/moe_rows.jsonl && hist /tmp/moe_rows.jsonl

step serving      # TTFT/ITG/adversary-stall rows, B=16 dense+paged, rowq fmt
$R 3 3600 python scripts/bench_serving.py llama32-1b q8_0r 16 \
  > /tmp/serving_rows.jsonl && hist /tmp/serving_rows.jsonl

step spec-decode  # spec-decode overhead + acceptance telemetry row
$R 2 3000 python scripts/bench_spec.py llama32-1b 8 \
  > /tmp/spec_rows.jsonl && hist /tmp/spec_rows.jsonl

step longctx      # 16k decode-at-depth row (32k path verified r2)
$R 2 3600 python scripts/bench_longctx.py llama32-1b q8_0 16384 \
  > /tmp/longctx_rows.jsonl && hist /tmp/longctx_rows.jsonl

step moe-phases   # MoE per-phase breakdown (VERDICT #4 second half)
LLAMATPU_NO_SHARED_FOLD=1 $R 2 3600 python scripts/perf_phases.py qwen15-moe-a2.7b q4_0-pack4 \
  > /tmp/pp_moe.json 2>/tmp/pp_moe.log

step done
