#!/usr/bin/env bash
# Black-box server smoke test — parity with the reference's
# scripts/server-smoke-test.sh (health/models/chat/completions/SSE checks
# against a running server), using a synthesized tiny checkpoint so it runs
# hermetically in CI.
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL=${MODEL:-/tmp/llamatpu-smoke.gguf}
PORT=${PORT:-18473}

python - <<EOF
import sys; sys.path.insert(0, "tests")
import tiny_models
tiny_models.build_tiny_gguf("$MODEL", family="llama", with_tokenizer=True, seed=7)
EOF

python -m llamatpu.cli serve --model "$MODEL" --port "$PORT" &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

for i in $(seq 1 120); do
  if curl -sf "http://127.0.0.1:$PORT/health" >/dev/null 2>&1; then break; fi
  sleep 1
done

echo "== /health"
curl -sf "http://127.0.0.1:$PORT/health" | grep -q '"ok"'

echo "== /v1/models"
curl -sf "http://127.0.0.1:$PORT/v1/models" | grep -q '"object": "list"'

echo "== chat completion (greedy determinism)"
BODY='{"messages":[{"role":"user","content":"hello"}],"max_tokens":8,"temperature":0}'
A=$(curl -sf -X POST "http://127.0.0.1:$PORT/v1/chat/completions" -H 'Content-Type: application/json' -d "$BODY")
B=$(curl -sf -X POST "http://127.0.0.1:$PORT/v1/chat/completions" -H 'Content-Type: application/json' -d "$BODY")
echo "$A" | grep -q '"chat.completion"'
echo "$A" | grep -q '"usage"'
[ "$(echo "$A" | python -c 'import json,sys; print(json.load(sys.stdin)["choices"][0]["message"]["content"])')" = \
  "$(echo "$B" | python -c 'import json,sys; print(json.load(sys.stdin)["choices"][0]["message"]["content"])')" ]

echo "== text completion"
curl -sf -X POST "http://127.0.0.1:$PORT/v1/completions" -H 'Content-Type: application/json' \
  -d '{"prompt":"hello","max_tokens":4}' | grep -q '"text_completion"'

echo "== SSE streaming"
OUT=$(curl -sf -N -X POST "http://127.0.0.1:$PORT/v1/chat/completions" -H 'Content-Type: application/json' \
  -d '{"messages":[{"role":"user","content":"hi"}],"max_tokens":4,"stream":true}')
echo "$OUT" | grep -q 'data: \[DONE\]'
echo "$OUT" | grep -q '"chat.completion.chunk"'

echo "== bad request -> 400"
CODE=$(curl -s -o /dev/null -w '%{http_code}' -X POST "http://127.0.0.1:$PORT/v1/chat/completions" \
  -H 'Content-Type: application/json' -d '{"messages":[]}')
[ "$CODE" = "400" ]

echo "server smoke test PASSED"
