"""Device mesh construction.

The reference is single-device (SURVEY.md §2.9 — multi-GPU is an unchecked
roadmap item); multi-chip scaling here is new TPU-native scope: a
jax.sharding.Mesh over {data, tensor} axes, with XLA GSPMD inserting the
collectives (the scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(tp: int | None = None, dp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp = all devices, dp = 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
