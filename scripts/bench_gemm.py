#!/usr/bin/env python3
"""Prefill GEMM A/B on chip: XLA int8 dot (current path) vs the Pallas w8a8
blocked GEMM (ops/pallas_gemm.py) at llama-1b pp512 shapes. On-device rep
loops (one dispatch per timing), TFLOP/s + int8-peak MFU per shape.

  python scripts/bench_gemm.py [T]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.ops.int8_prefill import quantize_activation_rows
from llamatpu.ops.pallas_gemm import rowq_gemm_pallas

INT8_PEAK = 394e12
REP = 32
SHAPES = {  # llama-1b prefill GEMMs (O, I)
    "wqkv": (2560, 2048),
    "wo": (2048, 2048),
    "w13": (16384, 2048),
    "w2": (2048, 8192),
}


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0)
    for name, (o, i) in SHAPES.items():
        qs = jnp.asarray(rng.integers(-127, 128, (o, i)), jnp.int8)
        sc = jnp.asarray(rng.random((o, 1)).astype(np.float32) / 127)
        x = jnp.asarray(rng.standard_normal((t, i)), jnp.bfloat16)
        xi8, ax = quantize_activation_rows(x)
        flops = 2.0 * t * o * i * REP

        @jax.jit
        def xla_prog(xi8, ax, qs, sc):
            def body(r, acc):
                p = jax.lax.dot_general(
                    xi8, qs, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                y = p * ax * sc[:, 0][None, :]
                return acc + jnp.sum(y) * 1e-30

            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        @jax.jit
        def pl_prog(xi8, ax, qs, sc):
            def body(r, acc):
                y = rowq_gemm_pallas(qs, sc, xi8, ax)
                return acc + jnp.sum(y) * 1e-30

            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        @jax.jit
        def pl_bf16_prog(xi8, ax, qs, sc):
            def body(r, acc):
                y = rowq_gemm_pallas(qs, sc, xi8, ax, variant="bf16")
                return acc + jnp.sum(y) * 1e-30

            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        row = {"bench": "gemm-ab", "shape": name, "T": t, "O": o, "I": i}
        for tag, prog in (("xla", xla_prog), ("pallas", pl_prog),
                          ("pl_bf16", pl_bf16_prog)):
            r = jax.block_until_ready(prog(xi8, ax, qs, sc))
            t0 = time.perf_counter()
            r = prog(xi8, ax, qs, sc)
            _ = jax.device_get(r)
            dt = time.perf_counter() - t0
            row[f"{tag}_tflops"] = round(flops / dt / 1e12, 1)
            row[f"{tag}_mfu_pct"] = round(flops / dt / INT8_PEAK * 100, 1)
        # correctness spot check
        y1 = jax.device_get(rowq_gemm_pallas(qs, sc, xi8, ax))
        p = jax.lax.dot_general(xi8, qs, dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32).astype(jnp.float32)
        y0 = jax.device_get(p * ax * sc[:, 0][None, :])
        row["maxdiff"] = float(np.abs(y1 - y0).max())
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
