"""DMA strategy sweep: how to stream int8 weights at HBM peak from pallas.

bench_roofline.py found (TPU v5e, 819GB/s peak): XLA bf16 matmul streams at
761GB/s, but the BlockSpec-pipelined pallas kernels cap at 257GB/s (int8) /
386GB/s (bf16) regardless of the compute inside. Hypothesis: the default
double-buffered pipeline keeps only ONE DMA in flight; deeper manual
pipelining (N concurrent async copies from an HBM-resident ref) should close
the gap. This sweeps BlockSpec tile sizes and manual-DMA depths.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/bench_dma_sweep.py
"""
from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, O, I = 24, 4096, 4096
R = 24
TT = 8


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, secs, bytes_per_val):
    vals = L * R * O * I
    print(f"{name:36s} {secs*1e3:8.2f} ms  {vals/secs/1e9:7.1f} Gv/s  "
          f"{vals*bytes_per_val/secs/1e9:7.1f} GB/s")


def chain(call):
    def run(ws, x):
        def sweep(x, _):
            y = call(ws, x)
            return (x.astype(jnp.float32) + y[:, :I] * 0.0).astype(x.dtype), None
        x, _ = jax.lax.scan(sweep, x, None, length=R)
        return x
    return jax.jit(run)


# -- A: BlockSpec pipeline probe, tile sweep ---------------------------------

def probe_blockspec(to):
    def call(ws, x):
        (wb,) = ws
        def kernel(x_ref, w_ref, o_ref):
            o_ref[0] = (w_ref[0, 0:TT, 0:128].astype(jnp.float32)
                        + x_ref[0, 0:TT, 0:1].astype(jnp.float32))
        y = pl.pallas_call(
            kernel, grid=(L, O // to),
            in_specs=[
                pl.BlockSpec((1, TT, I), lambda l, o: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, to, I), lambda l, o: (l, o, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TT, 128), lambda l, o: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, TT, 128), jnp.float32))(x[None], wb)
        return jnp.pad(y[0], ((0, 0), (0, O - 128)))
    return call


# -- B: manual DMA, depth sweep ----------------------------------------------

def probe_manual_dma(depth, ch):
    """Whole stack stays in HBM; kernel runs a depth-deep async-copy pipeline
    over [ch, I] chunks and touches one row per chunk."""
    n_chunks = (L * O) // ch

    def call(ws, x):
        (wb,) = ws
        wflat = wb.reshape(L * O, I)

        def kernel(x_ref, w_hbm, o_ref):
            def body(scratch, sems):
                def get(slot, c):
                    return pltpu.make_async_copy(
                        w_hbm.at[pl.ds(c * ch, ch), :], scratch.at[slot],
                        sems.at[slot])
                for s in range(min(depth, n_chunks)):
                    get(s, s).start()

                def step(c, acc):
                    slot = c % depth
                    get(slot, c).wait()
                    nxt = c + depth

                    @pl.when(nxt < n_chunks)
                    def _():
                        get(slot, nxt).start()
                    return acc + scratch[slot, 0:TT, 0:128].astype(jnp.float32)

                acc = jax.lax.fori_loop(
                    0, n_chunks, step, jnp.zeros((TT, 128), jnp.float32))
                o_ref[:] = acc + x_ref[0:TT, 0:1].astype(jnp.float32)

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((depth, ch, I), wflat.dtype),
                sems=pltpu.SemaphoreType.DMA((depth,)),
            )

        y = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TT, 128), jnp.float32),
        )(x, wflat)
        return jnp.pad(y, ((0, 0), (0, O - 128)))
    return call


# -- C: manual DMA + int8 dot (the future production shape) ------------------

def int8dot_manual_dma(depth, ch):
    n_chunks = (L * O) // ch

    def call(ws, x):
        qs, _ = ws
        wflat = qs.reshape(L * O, I)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16.0), -127, 127).astype(jnp.int8)

        def kernel(x_ref, w_hbm, o_ref):
            def body(scratch, sems):
                def get(slot, c):
                    return pltpu.make_async_copy(
                        w_hbm.at[pl.ds(c * ch, ch), :], scratch.at[slot],
                        sems.at[slot])
                for s in range(min(depth, n_chunks)):
                    get(s, s).start()

                def step(c, acc):
                    slot = c % depth
                    get(slot, c).wait()
                    nxt = c + depth

                    @pl.when(nxt < n_chunks)
                    def _():
                        get(slot, nxt).start()
                    p = jax.lax.dot_general(
                        x_ref[:], scratch[slot], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)   # [TT, ch]
                    return acc + jnp.sum(p, axis=1, keepdims=True).astype(jnp.float32)

                acc = jax.lax.fori_loop(
                    0, n_chunks, step, jnp.zeros((TT, 1), jnp.float32))
                o_ref[:] = jnp.pad(acc, ((0, 0), (0, 127)))

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((depth, ch, I), jnp.int8),
                sems=pltpu.SemaphoreType.DMA((depth,)),
            )

        y = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TT, 128), jnp.float32),
        )(xq, wflat)
        return jnp.pad(y, ((0, 0), (0, O - 128)))
    return call


def main():
    key = jax.random.PRNGKey(0)
    ws_bf = jax.device_put(jax.random.normal(key, (L, O, I), jnp.bfloat16))
    qs = jax.device_put(jax.random.randint(key, (L, O, I), -127, 128, jnp.int8))
    x = jax.device_put((jax.random.normal(key, (TT, I), jnp.float32) * 0.1
                        ).astype(jnp.bfloat16))
    rows = []
    for to in (256, 1024, 2048):
        rows.append((f"blockspec_probe_int8 to={to}", probe_blockspec(to), (qs,), 1))
    for depth, ch in ((2, 512), (4, 512), (8, 256), (4, 1024), (8, 512), (16, 256)):
        rows.append((f"manual_probe_int8 d={depth} ch={ch}",
                     probe_manual_dma(depth, ch), (qs,), 1))
    rows.append(("manual_probe_bf16 d=4 ch=512", probe_manual_dma(4, 512), (ws_bf,), 2))
    for depth, ch in ((4, 512), (8, 256), (8, 512)):
        rows.append((f"manual_int8dot d={depth} ch={ch}",
                     int8dot_manual_dma(depth, ch), (qs, None), 1))
    for name, call, ws, bpv in rows:
        try:
            report(name, timed(chain(call), ws, x), bpv)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
