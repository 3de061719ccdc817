#!/usr/bin/env python3
"""Megakernel-v3 chip debugger: one layer_attn_tail_fused_rowq call vs the
(fused-write attention -> v2 tail) composition at llama-1b geometry, on the
real chip. Interpret-mode parity passes (tests/test_layer_fused.py) but the
r5a mega-smoke produced wrong tokens AND 6x slowdown on chip — this isolates
whether the numerics break in phase A (attention/append) or phases B-D (the
weight chain), and times the single call.

  python scripts/debug_mega_v3.py [S] [pos]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.models.weights import QTensor
from llamatpu.ops.layer_fused import layer_attn_tail_fused_rowq, layer_tail_fused_rowq
from llamatpu.ops.pallas_attention import (decode_attention_fused_write,
                                           decode_attention_split)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1152
    pos_i = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    Lm, KV, G, hd = 16, 8, 4, 64
    d = KV * G * hd          # 2048
    f = 8192
    o13 = 2 * f
    EPS = 1e-5
    rng = np.random.default_rng(0)

    def rowq(o, i):
        qs = rng.integers(-127, 128, (Lm, o, i)).astype(np.int8)
        sc = (rng.random((Lm, o, 1)).astype(np.float32) + 0.5) / 127 / np.sqrt(i)
        return QTensor(jnp.asarray(qs), jnp.asarray(sc), "q8_row", None, None)

    wo, w13, w2 = rowq(d, d), rowq(o13, d), rowq(d, f)
    nw = jnp.asarray(rng.normal(0, 0.02, (Lm, d)).astype(np.float32) + 1.0)
    kvc = jnp.asarray(rng.normal(size=(Lm, 1, KV, S, 2 * hd)) * 0.3, jnp.bfloat16)
    q4 = jnp.asarray(rng.normal(size=(1, KV, G, hd)), jnp.bfloat16)
    kvn = jnp.asarray(rng.normal(size=(1, KV, 2 * hd)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, 1, d)) * 0.1, jnp.bfloat16)
    pos = jnp.asarray([pos_i], jnp.int32)
    li = 3

    interp = jax.default_backend() != "tpu"
    # composition oracle: fused-write full-stripe attention + v2 tail
    attn_ref, kvc2 = decode_attention_fused_write(q4, kvn, kvc, pos, 0.125,
                                                  li, hd=hd, interpret=interp)
    # split attention over same tiles as v3 picks (for the closer oracle)
    from llamatpu.ops.layer_fused import _fit_attn_tail
    fit = _fit_attn_tail(1, d, d, o13, f, KV, G, 2 * hd, S, 2, 2)
    print("fit (towo, to13, to2, s_tile):", fit, flush=True)
    towo, to13, to2, s_tile = fit
    attn_split = decode_attention_split(q4, kvc2, pos, 0.125, hd=hd,
                                        s_tile=s_tile, layer_index=li,
                                        interpret=interp)
    ref = layer_tail_fused_rowq(
        wo, w13, w2, nw, attn_split.reshape(1, 1, d).astype(x.dtype), x, li,
        EPS, 1.0)
    ref_full = layer_tail_fused_rowq(
        wo, w13, w2, nw, attn_ref.reshape(1, 1, d).astype(x.dtype), x, li,
        EPS, 1.0)

    out = layer_attn_tail_fused_rowq(wo, w13, w2, nw, q4, kvn, kvc, x, pos,
                                     li, EPS, 0.125, hd, 1.0)
    assert out is not None, "v3 not eligible at this geometry"
    y, kvc3 = out
    jax.block_until_ready(y)

    da = np.abs(np.asarray(attn_split, np.float32)
                - np.asarray(attn_ref, np.float32)).max()
    print(f"split-vs-full attention maxdiff (expected ~1e-6 class): {da:.3e}")
    dy = np.abs(np.asarray(y, np.float32) - np.asarray(ref, np.float32)).max()
    dyf = np.abs(np.asarray(y, np.float32) - np.asarray(ref_full, np.float32)).max()
    dc = np.abs(np.asarray(kvc3, np.float32) - np.asarray(kvc2, np.float32)).max()
    ry = np.abs(np.asarray(ref, np.float32)).max()
    print(f"v3 vs split-composition maxdiff: {dy:.3e}  (ref scale {ry:.3e})")
    print(f"v3 vs full-composition  maxdiff: {dyf:.3e}")
    print(f"cache write-back maxdiff: {dc:.3e}")

    # timing: 8 reps on device via fori (one dispatch)
    @jax.jit
    def timed(q4, kvn, kvc, x, pos):
        def body(i, acc):
            o = layer_attn_tail_fused_rowq(wo, w13, w2, nw, q4, kvn, kvc, x,
                                           pos + 0 * i, li, EPS, 0.125, hd,
                                           1.0)
            return acc + jnp.sum(o[0])

        return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

    r = jax.block_until_ready(timed(q4, kvn, kvc, x, pos))
    t0 = time.perf_counter()
    r = timed(q4, kvn, kvc, x, pos)
    _ = jax.device_get(r)
    dt = (time.perf_counter() - t0) / 8
    mb = (d * d + o13 * d + d * f) / 1e6
    print(f"v3 single-layer: {dt*1e3:.3f} ms/call ({mb/dt/1e3:.0f} GB/s weight stream)")

    # v2 tail timing for comparison
    @jax.jit
    def timed_v2(attn, x):
        def body(i, acc):
            y = layer_tail_fused_rowq(wo, w13, w2, nw, attn, x, li, EPS, 1.0)
            return acc + jnp.sum(y)

        return jax.lax.fori_loop(0, 8, body, jnp.float32(0))

    attn_x = attn_ref.reshape(1, 1, d).astype(x.dtype)
    r = jax.block_until_ready(timed_v2(attn_x, x))
    t0 = time.perf_counter()
    r = timed_v2(attn_x, x)
    _ = jax.device_get(r)
    dt2 = (time.perf_counter() - t0) / 8
    print(f"v2 tail single-layer: {dt2*1e3:.3f} ms/call ({mb/dt2/1e3:.0f} GB/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
