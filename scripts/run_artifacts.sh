#!/bin/bash
# Sequential TPU artifact run (ONE relay client at a time) — round 4 order:
# every number the verdict wants engine-measured and committed, priority
# first so a dying session still lands the headline artifacts.
#   nohup scripts/run_artifacts.sh > /tmp/artifacts.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
H=scripts/append_perf_history.py

step() { echo "##### $(date -u +%H:%M:%S) STEP: $* #####"; }
hist() { while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' "$1"); }

step bench-rowq   # driver bench: rowq + layer megakernel v2 (fresh compile)
$R 3 3000 python bench.py | tee /tmp/bench_r04.json

step decode-phases-rowq  # per-phase rowq decode incl. the fused megakernel calls
$R 3 3600 python scripts/perf_phases.py llama32-1b q8_0-rowq > /tmp/pp_rowq.json 2>/tmp/pp_rowq.log

step parity       # PARITY.md: llama full-depth + MoE reduced-depth tables
$R 2 5400 python scripts/run_parity.py

step moe-phases   # MoE per-phase breakdown (VERDICT #4; q4_0p fits the chip)
$R 3 3600 python scripts/perf_phases.py qwen15-moe-a2.7b q4_0-pack4 > /tmp/pp_moe.json 2>/tmp/pp_moe.log

step prefill-phases  # prefill roofline rows (VERDICT #5): bf16 vs int8 MXU
$R 3 3600 python scripts/perf_phases.py --prefill llama32-1b q8_0 > /tmp/pf_q8.json 2>/tmp/pf_q8.log
$R 3 3600 python scripts/perf_phases.py --prefill llama32-1b q8_0-rowq > /tmp/pf_rowq.json 2>/tmp/pf_rowq.log

step q4k-bench    # native Q4_K rows (VERDICT #6): mistral-7b + llama-1b
$R 3 3600 python scripts/bench_matrix.py mistral-7b:q4_kp mistral-7b:q4_k llama32-1b:q4_kp \
  > /tmp/q4k_rows.jsonl && hist /tmp/q4k_rows.jsonl

step serving      # TTFT/ITG/adversary-stall rows, B=16 dense+paged, rowq fmt
$R 3 3600 python scripts/bench_serving.py llama32-1b q8_0r 16 \
  > /tmp/serving_rows.jsonl && hist /tmp/serving_rows.jsonl

step longctx      # 16k decode-at-depth row (32k verified r2; one ctx fits
                  # the remaining session budget)
$R 3 3600 python scripts/bench_longctx.py llama32-1b q8_0 16384 \
  > /tmp/longctx_rows.jsonl && hist /tmp/longctx_rows.jsonl

step spec-decode  # spec-decode overhead + acceptance telemetry row
$R 2 3000 python scripts/bench_spec.py llama32-1b 8 \
  > /tmp/spec_rows.jsonl && hist /tmp/spec_rows.jsonl

step moe-bench    # MoE decode row refresh post grouped-kernel work
$R 3 3600 python scripts/bench_matrix.py qwen15-moe-a2.7b:q4_0p \
  > /tmp/moe_rows.jsonl && hist /tmp/moe_rows.jsonl

step matrix       # headline rows refresh (r2 rows stand for the rest)
$R 3 3600 python scripts/bench_matrix.py llama32-1b:q8_0r llama32-1b \
  > /tmp/matrix_rows.jsonl && hist /tmp/matrix_rows.jsonl

step done
