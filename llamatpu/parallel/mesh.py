"""Device mesh construction.

The reference is single-device (SURVEY.md §2.9 — multi-GPU is an unchecked
roadmap item); multi-chip scaling here is new TPU-native scope: a
jax.sharding.Mesh over {data, pipeline, sequence, tensor} axes, with XLA GSPMD
inserting the collectives for dp/sp/tp (the scaling-book recipe: pick a mesh,
annotate shardings, let XLA insert collectives) and shard_map + ppermute
driving the pp stages (parallel/pipeline.py).

Axis order is outermost-to-innermost ICI locality: tp innermost (per-layer
all-reduces every matmul — needs the fastest links), then sp (attention
softmax/contract all-reduces per layer), then pp (one activation hop per
stage boundary), dp outermost (no per-token communication).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "pp", "sp", "tp")


def make_mesh(tp: int | None = None, dp: int | None = None,
              sp: int = 1, pp: int = 1, devices=None) -> Mesh:
    """Build a (dp, pp, sp, tp) mesh. Defaults: tp = all remaining devices,
    dp = 1. Size-1 axes are kept (specs that don't mention them replicate)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    rest = n // (sp * pp)
    assert rest * sp * pp == n, f"sp*pp={sp * pp} must divide {n} devices"
    if tp is None and dp is None:
        tp, dp = rest, 1
    elif tp is None:
        tp = rest // dp
    elif dp is None:
        dp = rest // tp
    assert dp * pp * sp * tp == n, f"mesh {dp}x{pp}x{sp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, pp, sp, tp)
    return Mesh(arr, axis_names=AXES)
