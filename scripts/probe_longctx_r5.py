#!/usr/bin/env python3
"""Round-5 long-context decode diagnosis (chip). Each probe runs its whole
repetition loop ON DEVICE inside one jit (one dispatch, one fetch), so the
relay RTT and execute-queue behavior cannot distort per-step numbers the way
the r4c probe's host-looped reps could (it reported 3377 ms/step for
attention-only, inconsistent with the engine's own 89 ms/tok).

Probes (llama-1b attention geometry, L=16, KV=8, G=4, hd=64, pos=16384):
  attn-t256   splitKV attention, S=17152 (tile 256 — the r4 layout)
  attn-t1024  splitKV attention, S=17408 (tile 1024 — post f0c2ef4 layout)
  writes      2 dus per layer into carried caches (engine's unfused path)
  fused-1024  decode_attention_split_fused_write per layer (append+attend)

Prints one JSON line per probe: {"probe": ..., "ms_per_step": ...}.
"""
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.ops.pallas_attention import (decode_attention_split,
                                           decode_attention_split_fused_write)
# NOTE: post-packing (r5) the kernels take ONE packed [L,B,KV,S,hd+vhd] cache

L, KV, G, HD = 16, 8, 4, 64
POS = 16384
REP = 8


def run(tag, fn, *args):
    r = jax.block_until_ready(fn(*args))  # compile + first-execution
    t0 = time.perf_counter()
    r = fn(*args)
    _ = jax.device_get(jnp.ravel(r)[0])  # sync by reading a host value
    dt = (time.perf_counter() - t0) / REP
    print(json.dumps({"probe": tag, "ms_per_step": round(dt * 1e3, 2)}),
          flush=True)
    return dt


def make_attn(s, tile):
    @jax.jit
    def f(q, kvc, pv):
        def rep_body(r, acc):
            qr = q * (1 + 1e-9 * r.astype(jnp.float32)).astype(q.dtype)

            def body(i, a):
                o = decode_attention_split(qr, kvc, pv, 0.125, hd=HD,
                                           s_tile=tile, layer_index=i)
                return a + jnp.sum(o)

            return jax.lax.fori_loop(0, L, body, acc)

        return jax.lax.fori_loop(0, REP, rep_body, jnp.float32(0))

    return f


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr, flush=True)
    pv = jnp.asarray([POS], jnp.int32)

    for tag, s, tile in (("attn-t256", 17152, 256), ("attn-t1024", 17408, 1024)):
        q = jnp.ones((1, KV, G, HD), jnp.bfloat16)
        kvc = jnp.zeros((L, 1, KV, s, 2 * HD), jnp.bfloat16)
        run(tag, make_attn(s, tile), q, kvc, pv)
        del kvc

    s = 17408
    new = jnp.ones((1, 1, KV, 1, 2 * HD), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def writes(kvc, pv):
        def rep_body(r, c):
            def body(i, c2):
                return jax.lax.dynamic_update_slice(
                    c2, new, (i, 0, 0, pv[0] + r, 0))

            return jax.lax.fori_loop(0, L, body, c)

        kvc = jax.lax.fori_loop(0, REP, rep_body, kvc)
        return jnp.sum(kvc[0, 0, 0, POS].astype(jnp.float32))

    kvc = jnp.zeros((L, 1, KV, s, 2 * HD), jnp.bfloat16)
    r0 = writes(kvc, jnp.asarray([POS], jnp.int32))  # warm (donated!)
    jax.block_until_ready(r0)
    kvc = jnp.zeros((L, 1, KV, s, 2 * HD), jnp.bfloat16)
    t0 = time.perf_counter()
    r = writes(kvc, jnp.asarray([POS], jnp.int32))
    _ = jax.device_get(r)
    print(json.dumps({"probe": "writes",
                      "ms_per_step": round((time.perf_counter() - t0) / REP
                                           * 1e3, 2)}), flush=True)

    q = jnp.ones((1, KV, G, HD), jnp.bfloat16)
    kvn = jnp.ones((1, KV, 2 * HD), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def fused(q, kvn, kvc, pv):
        def rep_body(r, c):
            def body(i, c2):
                _, c3 = decode_attention_split_fused_write(
                    q, kvn, c2, pv + r, 0.125, i, hd=HD, s_tile=1024)
                return c3

            return jax.lax.fori_loop(0, L, body, c)

        kvc = jax.lax.fori_loop(0, REP, rep_body, kvc)
        return jnp.sum(kvc[0, 0, 0, POS].astype(jnp.float32))

    kvc = jnp.zeros((L, 1, KV, s, 2 * HD), jnp.bfloat16)
    r = fused(q, kvn, kvc, jnp.asarray([POS], jnp.int32))
    jax.block_until_ready(r)
    kvc = jnp.zeros((L, 1, KV, s, 2 * HD), jnp.bfloat16)
    t0 = time.perf_counter()
    r = fused(q, kvn, kvc, jnp.asarray([POS], jnp.int32))
    _ = jax.device_get(r)
    print(json.dumps({"probe": "fused-1024",
                      "ms_per_step": round((time.perf_counter() - t0) / REP
                                           * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
