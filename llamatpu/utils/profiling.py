"""Tracing / profiling utilities.

TPU-native equivalent of the reference's profiling surface (SURVEY.md §5:
TornadoVM profiler passthrough + kernel/bytecode dumps): jax.profiler traces
(viewable in XProf/Perfetto/TensorBoard) and compiled-HLO dumps.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """Capture a device trace into `profile_dir` (no-op when None)."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dump_decode_hlo(engine, path: str, optimized: bool = True) -> None:
    """Write the decode program's HLO (analog of --print-kernel /
    --dump-hlo in the reference launcher, llama-tornado:199-213)."""
    import numpy as np

    greedy, temp, topp = engine._resolve_sampling(None, None)
    _, decode_n = engine._programs(greedy)
    lowered = decode_n.lower(
        engine.weights, np.zeros((engine.batch_size,), np.int32), engine.cache,
        np.int32(0), engine._rng, engine._stops_array(set()), np.int32(1),
        temp, topp)
    if optimized:
        try:
            text = lowered.compile().as_text()
        except Exception:
            text = lowered.as_text()
    else:
        text = lowered.as_text()
    with open(path, "w") as f:
        f.write(text)
