"""HBM roofline microbench: what byte/value rate does each matvec path reach?

Settles the round-1 verdict question: Q8_0 decode ran at bf16's VALUE rate
(~350G values/s), i.e. half the BYTE rate — is that hardware (HBM can't stream
int8 faster) or the kernel (VPU-bound fused dequant)?

Harness mirrors the production decode step exactly (models/transformer.py
carry-form scan): weights ride lax.scan xs over an L-layer stack, the matvec
output chains into the next layer's activation, R sweeps run inside ONE jit
(one host sync per timing — the ~30ms relay RTT never touches the numbers).

Run on the real chip:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/bench_roofline.py
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, O, I = 24, 4096, 4096      # 400M values per sweep
R = 24                        # sweeps per timed run
BLOCK = 32
NB = I // BLOCK
TO = 512                      # weight rows per pallas program
TT = 8                        # activation rows (production pads T=1 -> 8)


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.device_get(jnp.ravel(out)[0]))  # host-sync read
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, secs):
    vals = L * R * O * I
    print(f"{name:24s} {secs*1e3:8.2f} ms  {vals/secs/1e9:7.1f} G values/s  "
          f"(int8 {vals/secs/1e9:6.1f} GB/s | bf16 {2*vals/secs/1e9:6.1f} GB/s)")


def scan_runner(step):
    """R sweeps of an L-layer scan; step(ws_slices_tuple, x) -> y [TT, O]."""
    def run(ws, x):
        def sweep(x, _):
            def layer(x, w):
                y = step(w, x)
                # chain without changing the carry's shape/dtype
                return (x.astype(jnp.float32) + y[:, :I] * 0.0).astype(x.dtype), None
            x, _ = jax.lax.scan(layer, x, ws)
            return x, None
        x, _ = jax.lax.scan(sweep, x, None, length=R)
        return x
    return jax.jit(run)


X_SPEC = pl.BlockSpec((TT, I), lambda o: (0, 0), memory_space=pltpu.VMEM)
OUT_SPEC = pl.BlockSpec((TT, TO), lambda o: (0, o), memory_space=pltpu.VMEM)
OUT_SHAPE = jax.ShapeDtypeStruct((TT, O), jnp.float32)


def w_spec(cols):
    return pl.BlockSpec((TO, cols), lambda o: (o, 0), memory_space=pltpu.VMEM)


# -- variants (step(w_tuple, x [TT, I] bf16) -> [TT, O] f32) ---------------

def step_xla_bf16(w, x):
    (wb,) = w
    return jax.lax.dot_general(x, wb, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def step_repo_q8(w, x):
    """The repo's ACTUAL production kernel (interleaved fused dequant)."""
    from llamatpu.ops.pallas_matmul import _quant_matmul_2d
    qs, ss = w
    return _quant_matmul_2d(qs, ss, x, interpret=False, layout="interleaved")


def step_pallas_bf16(w, x):
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    (wb,) = w
    return pl.pallas_call(
        kernel, grid=(O // TO,), in_specs=[X_SPEC, w_spec(I)],
        out_specs=OUT_SPEC, out_shape=OUT_SHAPE)(x, wb)


def step_q8_current(w, x):
    """Today's fused dequant: f32 convert * repeated scales -> bf16 -> MXU."""
    def kernel(x_ref, w_ref, s_ref, o_ref):
        s_exp = pltpu.repeat(s_ref[:].astype(jnp.float32), BLOCK, axis=1)
        wd = (w_ref[:].astype(jnp.float32) * s_exp).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(x_ref[:], wd, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    qs, ss = w
    return pl.pallas_call(
        kernel, grid=(O // TO,), in_specs=[X_SPEC, w_spec(I), w_spec(NB)],
        out_specs=OUT_SPEC, out_shape=OUT_SHAPE)(x, qs, ss)


def step_q8_bf16mul(w, x):
    """bf16 convert + bf16 multiply (half the VPU f32 work)."""
    def kernel(x_ref, w_ref, s_ref, o_ref):
        s_exp = pltpu.repeat(s_ref[:].astype(jnp.bfloat16), BLOCK, axis=1)
        wd = w_ref[:].astype(jnp.bfloat16) * s_exp
        o_ref[:] = jax.lax.dot_general(x_ref[:], wd, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    qs, ss = w
    return pl.pallas_call(
        kernel, grid=(O // TO,), in_specs=[X_SPEC, w_spec(I), w_spec(NB)],
        out_specs=OUT_SPEC, out_shape=OUT_SHAPE)(x, qs, ss)


def step_q8_int8dot(w, x):
    """int8 weights straight to the MXU (no per-element dequant): int8xint8
    dot, int32 accumulate. Per-tensor activation scale (rate probe)."""
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    qs, _ = w
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16.0), -127, 127).astype(jnp.int8)
    return pl.pallas_call(
        kernel, grid=(O // TO,),
        in_specs=[X_SPEC, w_spec(I)],
        out_specs=OUT_SPEC, out_shape=OUT_SHAPE)(xq, qs)


def step_q8_int8dot_blockscale(w, x):
    """int8 MXU dot + per-block weight scales applied via a second tiny MXU
    contraction over the partial [TT, TO] (approximate cost model: one full
    int8 dot + one [TO,NB]@[NB,TT] scale dot — same HBM bytes as exact)."""
    def kernel(x_ref, xs_ref, w_ref, s_ref, o_ref):
        p = jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)  # [TT, TO]
        corr = jax.lax.dot_general(s_ref[:], xs_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # [TO, TT]
        o_ref[:] = p.astype(jnp.float32) * corr.T
    qs, ss = w
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16.0), -127, 127).astype(jnp.int8)
    xs = jnp.ones((TT, NB), jnp.float32)
    return pl.pallas_call(
        kernel, grid=(O // TO,),
        in_specs=[X_SPEC, pl.BlockSpec((TT, NB), lambda o: (0, 0), memory_space=pltpu.VMEM),
                  w_spec(I), w_spec(NB)],
        out_specs=OUT_SPEC, out_shape=OUT_SHAPE)(xq, xs, qs, ss)


def step_dma_probe(w, x):
    """Pure streaming probe: blocks are DMA'd by the pallas pipeline, the body
    touches one row — HBM->VMEM rate with ~zero compute."""
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.zeros((TT, TO), jnp.float32)
        o_ref[0, :] = w_ref[0, 0:TO].astype(jnp.float32) + x_ref[0, 0].astype(jnp.float32)
    (wb,) = w
    y = pl.pallas_call(
        kernel, grid=(O // TO,), in_specs=[X_SPEC, w_spec(I)],
        out_specs=pl.BlockSpec((TT, TO), lambda o: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TT, TO), jnp.float32),
    )(x, wb)
    return jnp.pad(y, ((0, 0), (0, O - TO)))


def main():
    print(f"backend={jax.default_backend()}  L={L} O={O} I={I} R={R} TT={TT} "
          f"({L*O*I/1e6:.0f}M values/sweep)")
    key = jax.random.PRNGKey(0)
    ws_bf = jax.device_put(jax.random.normal(key, (L, O, I), jnp.bfloat16))
    qs = jax.device_put(jax.random.randint(key, (L, O, I), -127, 128, jnp.int8))
    ss = jax.device_put(jnp.abs(jax.random.normal(key, (L, O, NB), jnp.float32)) * 0.01)
    x = jax.device_put((jax.random.normal(key, (TT, I), jnp.float32) * 0.1
                        ).astype(jnp.bfloat16))

    for name, step, ws in [
        ("dma_probe_bf16", step_dma_probe, (ws_bf,)),
        ("dma_probe_int8", step_dma_probe, (qs,)),
        ("xla_bf16", step_xla_bf16, (ws_bf,)),
        ("pallas_bf16", step_pallas_bf16, (ws_bf,)),
        ("repo_q8_interleaved", step_repo_q8, (qs, ss)),
        ("q8_current", step_q8_current, (qs, ss)),
        ("q8_bf16mul", step_q8_bf16mul, (qs, ss)),
        ("q8_int8dot", step_q8_int8dot, (qs, ss)),
        ("q8_int8dot_blockscale", step_q8_int8dot_blockscale, (qs, ss)),
    ]:
        try:
            fn = scan_runner(step)
            report(name, timed(fn, ws, x))
        except Exception as e:  # keep the sweep alive past one bad variant
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()


# -- no-scan variants: 3D grid straight over the [L, O, I] stack ------------
# (isolates lax.scan slice/launch overhead from kernel + DMA rate: the pallas
# pipeline DMAs blocks directly from the stacked array, 192 grid steps/sweep)

def stack_runner(call):
    """R sweeps; each sweep is ONE pallas call over the whole stack."""
    def run(ws, x):
        def sweep(x, _):
            y = call(ws, x)
            return (x.astype(jnp.float32) + y[:, :I] * 0.0).astype(x.dtype), None
        x, _ = jax.lax.scan(sweep, x, None, length=R)
        return x
    return jax.jit(run)


X3 = pl.BlockSpec((1, TT, I), lambda l, o: (0, 0, 0), memory_space=pltpu.VMEM)
OUT3_SPEC = pl.BlockSpec((1, TT, TO), lambda l, o: (l, 0, o), memory_space=pltpu.VMEM)
OUT3_SHAPE = jax.ShapeDtypeStruct((L, TT, O), jnp.float32)


def w3_spec(cols):
    return pl.BlockSpec((1, TO, cols), lambda l, o: (l, o, 0), memory_space=pltpu.VMEM)


def call3_q8_current(ws, x):
    qs, ss = ws
    def kernel(x_ref, w_ref, s_ref, o_ref):
        s_exp = pltpu.repeat(s_ref[0].astype(jnp.float32), BLOCK, axis=1)
        wd = (w_ref[0].astype(jnp.float32) * s_exp).astype(jnp.bfloat16)
        o_ref[0] = jax.lax.dot_general(x_ref[0], wd, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    y = pl.pallas_call(
        kernel, grid=(L, O // TO), in_specs=[X3, w3_spec(I), w3_spec(NB)],
        out_specs=OUT3_SPEC, out_shape=OUT3_SHAPE)(x[None], qs, ss)
    return y[0]


def call3_q8_int8dot(ws, x):
    qs, _ = ws
    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            x_ref[0], w_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16.0), -127, 127).astype(jnp.int8)
    y = pl.pallas_call(
        kernel, grid=(L, O // TO), in_specs=[X3, w3_spec(I)],
        out_specs=OUT3_SPEC, out_shape=OUT3_SHAPE)(xq[None], qs)
    return y[0]


def call3_bf16(ws, x):
    (wb,) = ws
    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(x_ref[0], w_ref[0], (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    y = pl.pallas_call(
        kernel, grid=(L, O // TO), in_specs=[X3, w3_spec(I)],
        out_specs=OUT3_SPEC, out_shape=OUT3_SHAPE)(x[None], wb)
    return y[0]


def call3_dma_probe(ws, x):
    (wb,) = ws
    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = (w_ref[0, 0:TT, 0:TO].astype(jnp.float32)
                    + x_ref[0, 0:TT, 0:1].astype(jnp.float32))
    y = pl.pallas_call(
        kernel, grid=(L, O // TO), in_specs=[X3, w3_spec(I)],
        out_specs=pl.BlockSpec((1, TT, TO), lambda l, o: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, TT, TO), jnp.float32))(x[None], wb)
    return jnp.pad(y[0], ((0, 0), (0, O - TO)))


def call_big_xla_bf16(ws, x):
    (wb,) = ws
    y = jax.lax.dot_general(x, wb.reshape(L * O, I), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y[:, :O]


def main2():
    key = jax.random.PRNGKey(0)
    ws_bf = jax.device_put(jax.random.normal(key, (L, O, I), jnp.bfloat16))
    qs = jax.device_put(jax.random.randint(key, (L, O, I), -127, 128, jnp.int8))
    ss = jax.device_put(jnp.abs(jax.random.normal(key, (L, O, NB), jnp.float32)) * 0.01)
    x = jax.device_put((jax.random.normal(key, (TT, I), jnp.float32) * 0.1
                        ).astype(jnp.bfloat16))
    for name, call, ws in [
        ("3d_dma_probe_bf16", call3_dma_probe, (ws_bf,)),
        ("3d_dma_probe_int8", call3_dma_probe, (qs,)),
        ("3d_bf16", call3_bf16, (ws_bf,)),
        ("3d_q8_current", call3_q8_current, (qs, ss)),
        ("3d_q8_int8dot", call3_q8_int8dot, (qs, ss)),
        ("big_xla_bf16", call_big_xla_bf16, (ws_bf,)),
    ]:
        try:
            fn = stack_runner(call)
            report(name, timed(fn, ws, x))
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__" and "--3d" in sys.argv:
    main2()
