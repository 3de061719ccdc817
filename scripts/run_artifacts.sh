#!/bin/bash
# Sequential TPU artifact run (ONE relay client at a time): every harness that
# VERDICT r2 flagged as "built but never run on chip", in priority order.
# Each step runs under tpu_retry (remote-compile broken-pipe resilience);
# results append to docs/perf-history.jsonl or land as committed artifacts.
#   nohup scripts/run_artifacts.sh > /tmp/artifacts.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R=scripts/tpu_retry.sh
H=scripts/append_perf_history.py

step() { echo "##### $(date -u +%H:%M:%S) STEP: $* #####"; }

step verify-cli   # drive the CLI end-to-end on the chip (tiny model)
python - <<'EOF'
import sys; sys.path.insert(0, "tests")
import tiny_models
tiny_models.build_tiny_gguf("/tmp/tiny_llama.gguf", family="llama",
                            with_tokenizer=True, seed=7)
EOF
$R 2 1800 python -m llamatpu.cli run --model /tmp/tiny_llama.gguf \
  --prompt "hello world" --temperature 0 -n 64

step rowq-bench   # q8_row serving-format decode/prefill rows (+ cached q8_0 ref)
$R 3 2700 python scripts/bench_matrix.py llama32-1b:q8_0r llama32-1b \
  > /tmp/rowq_rows.jsonl && \
  while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' /tmp/rowq_rows.jsonl)

step parity       # PARITY.md at production geometry (data-derived verdict)
$R 3 3000 python scripts/run_parity.py llama32-1b

step serving      # TTFT/ITG/adversary-stall rows, B=16 dense+paged
$R 3 3000 python scripts/bench_serving.py llama32-1b q8_0 16 \
  > /tmp/serving_rows.jsonl && \
  while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' /tmp/serving_rows.jsonl)

step longctx      # 16k/32k decode-at-depth rows
$R 3 3000 python scripts/bench_longctx.py llama32-1b q8_0 16384,32768 \
  > /tmp/longctx_rows.jsonl && \
  while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' /tmp/longctx_rows.jsonl)

step spec-decode  # spec-decode overhead + acceptance telemetry row
$R 2 2700 python scripts/bench_spec.py llama32-1b 8 \
  > /tmp/spec_rows.jsonl && \
  while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' /tmp/spec_rows.jsonl)

step matrix       # full preset matrix refresh (most compile-expensive; last)
$R 4 3600 python scripts/bench_matrix.py > /tmp/matrix_rows.jsonl && \
  while read -r l; do echo "$l" | python $H /dev/stdin; done < <(grep '^{' /tmp/matrix_rows.jsonl)

step done
