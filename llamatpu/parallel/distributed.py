"""Multi-host initialization (new TPU-native scope — SURVEY.md §2.9: the
reference has no distributed backend at all).

Wraps jax.distributed.initialize: on TPU pods the coordinator/process count
come from the environment automatically; explicit args override for manual
topologies. Call once per process before building a cross-host Mesh
(jax.devices() then spans every host's chips and collectives ride ICI/DCN).
"""
from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize multi-host JAX. Returns True if distributed mode is active
    (more than one process), False for single-process runs (no-op)."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("LLAMATPU_NUM_PROCESSES", 0)) or None
    if coordinator_address is None:
        coordinator_address = os.environ.get("LLAMATPU_COORDINATOR") or None
    if process_id is None:
        pid = os.environ.get("LLAMATPU_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if num_processes in (None, 1) and coordinator_address is None:
        return False  # single host; TPU pod runtimes auto-init inside jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
