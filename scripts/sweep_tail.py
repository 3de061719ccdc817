#!/usr/bin/env python3
"""On-chip A/B sweep of the layer-tail megakernel's w2 phase layout
(ops/layer_fused.py _W2_KTILE): variant A streams w2 as out-tiled short-fat
[to2, F] blocks, variant B as contraction-tiled tall [D, tf] blocks (the
vocab head's 740 GB/s shape). Prints ms per layer-set pass + effective GB/s
for each; the winner becomes the module default.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/sweep_tail.py [preset]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

REPEAT = 512


def main() -> int:
    import llamatpu.ops.layer_fused as lf
    from llamatpu.models.synthetic import PRESETS, _rand_qtensor
    from llamatpu.models.weights import QTensor, prepare_qtensor, rowq_requant

    preset = sys.argv[1] if len(sys.argv) > 1 else "llama32-1b"
    g = PRESETS[preset]
    L, D, F = g["n_layers"], g["dim"], g["hidden_dim"]
    H = g["n_heads"] * g.get("head_dim", D // g["n_heads"])
    rng = np.random.default_rng(0)

    def rowq(o, i):
        return rowq_requant(prepare_qtensor(
            _rand_qtensor(rng, (L, o, i), "q8_0")))

    t0 = time.time()
    wo, w13, w2 = rowq(D, H), rowq(2 * F, D), rowq(D, F)
    nrm = jnp.ones((L, D), jnp.float32)
    print(f"# weights built {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    nbytes = wo.qs.size // L + w13.qs.size // L + w2.qs.size // L  # per pass

    li_seq = jnp.tile(jnp.arange(L, dtype=jnp.int32), REPEAT)

    def prog(st):
        def step(c, li):
            x, attn = c
            y = lf.layer_tail_fused_rowq(st["wo"], st["w13"], st["w2"],
                                         st["n"], attn, x, li, 1e-5, 1.0)
            return (x + y.astype(x.dtype) * 1e-6, attn), None

        c, _ = jax.lax.scan(step, (st["x"], st["attn"]), li_seq)
        return c[0]

    state = {"x": jnp.zeros((1, 1, D), jnp.bfloat16),
             "attn": jnp.ones((1, 1, H), jnp.bfloat16) * 0.01,
             "wo": wo, "w13": w13, "w2": w2, "n": nrm}

    rows = []
    for kt in (False, True):
        lf._W2_KTILE = kt
        pj = jax.jit(prog)
        t0 = time.time()
        out = pj(state)
        jax.block_until_ready(out)
        print(f"# variant kt={kt}: compiled+warm {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = pj(state)
            _ = np.asarray(jax.device_get(out[0, 0, 0]))
            best = min(best, time.time() - t0)
        per = best / (L * REPEAT)
        row = {"variant": "w2_ktile" if kt else "w2_outtile",
               "ms_per_layer": per * 1e3,
               "ms_per_tok": per * L * 1e3,
               "gbs": nbytes * L / (per * L) / 1e9}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
