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

step serving-retry  # r4b's serving step burned its tries on the pre-fix
                    # Mosaic lowering crash; re-run with the fixed kernel
$R 2 3600 python scripts/bench_serving.py llama32-1b q8_0r 16 \
  > /tmp/serving_rows2.jsonl && hist /tmp/serving_rows2.jsonl

step mega-smoke   # megakernel v3 on chip: parity + quick rate probe
$R 2 3000 python - <<'PYEOF'
import os, sys, time
sys.path.insert(0, ".")
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
import json
print(json.dumps({"bench": "mega-smoke", "model": "llama32-1b",
                  "quant": "q8_0r", "mega_tok_s": round(rates["mega"], 1),
                  "v2_tok_s": round(rates["v2"], 1),
                  "tokens_match": outs["mega"] == outs["v2"]}), flush=True)
PYEOF

step longctx-probe  # 11.2 tok/s @16k is ~30x under roofline — localize:
                    # attention-only loop at depth vs the engine number
$R 2 3000 python - <<'PYEOF'
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np

L, KV, G, hd, S = 16, 8, 4, 64, 17152
pos = 16384
kc = jnp.zeros((L, 1, KV, S, hd), jnp.bfloat16)
vc = jnp.zeros((L, 1, KV, S, hd), jnp.bfloat16)
q = jnp.ones((1, KV, G, hd), jnp.bfloat16)
pv = jnp.asarray([pos], jnp.int32)

from llamatpu.ops.pallas_attention import decode_attention_auto

@jax.jit
def attn_all_layers(q, kc, vc, pv):
    def body(i, acc):
        a = decode_attention_auto(q, kc, vc, pv, 0.125, layer_index=i)
        return acc + jnp.sum(a)
    return jax.lax.fori_loop(0, L, body, jnp.float32(0))

r = attn_all_layers(q, kc, vc, pv); r.block_until_ready()
t0 = time.perf_counter()
REP = 20
for _ in range(REP):
    r = attn_all_layers(q, kc, vc, pv)
np_r = jax.device_get(r)
dt = (time.perf_counter() - t0) / REP
print(f"attention-only 16 layers @ depth {pos}: {dt*1e3:.2f} ms/step "
      f"({KV*S*(hd+hd)*2*L/dt/1e9:.0f} GB/s stripe incl. slack)", flush=True)

# and the write path: 2 dynamic_update_slice per layer at depth
@jax.jit
def writes_all_layers(kc, vc, pv):
    def body(i, c):
        kc_, vc_ = c
        new = jnp.ones((1, 1, KV, 1, hd), jnp.bfloat16)
        kc_ = jax.lax.dynamic_update_slice(kc_, new, (i, 0, 0, pv[0], 0))
        vc_ = jax.lax.dynamic_update_slice(vc_, new, (i, 0, 0, pv[0], 0))
        return (kc_, vc_)
    return jax.lax.fori_loop(0, L, body, (kc, vc))

kc2, vc2 = writes_all_layers(kc, vc, pv)
jax.block_until_ready(kc2)
t0 = time.perf_counter()
for _ in range(REP):
    kc2, vc2 = writes_all_layers(kc2, vc2, pv)
s = jax.device_get(jnp.sum(kc2[0, 0, 0, pos]))
dt = (time.perf_counter() - t0) / REP
print(f"writes-only 16 layers @ depth {pos}: {dt*1e3:.2f} ms/step", flush=True)
PYEOF

step done  # all steps complete (advisor r4: marker moved to the end)
