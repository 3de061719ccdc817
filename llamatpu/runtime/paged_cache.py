"""Paged KV cache: a shared block pool + per-lane block tables.

North-star feature (BASELINE.json: "flash-style attention over an HBM-resident
paged KV-cache") with no reference counterpart (the reference preallocates
[nLayers][ctx*kvDim] per conversation, State.java:44-45): serving memory scales
with tokens actually in flight instead of lanes x max-context, so more/longer
sequences fit per chip.

Device side: pools [L, NBLK, KV, BS, hd]; writes scatter (block, offset)
computed from absolute position; attention gathers the lane's table into a
dense head-major view and reuses the standard masked-attention path (positions
beyond the lane's length are masked, so stale/foreign block contents are
harmless). Host side: a free-list BlockAllocator grows each lane's table on
demand and recycles blocks when lanes finish.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.models.config import ModelConfig


@partial(jax.tree_util.register_dataclass, data_fields=["k_pool", "v_pool"],
         meta_fields=["block_size"])
@dataclass
class PagedKVCache:
    k_pool: jax.Array  # [L, NBLK, KV, BS, hd]
    v_pool: jax.Array  # [L, NBLK, KV, BS, vhd]
    block_size: int

    @property
    def n_blocks(self) -> int:
        return self.k_pool.shape[1]


def init_paged_cache(cfg: ModelConfig, n_blocks: int, block_size: int = 16,
                     dtype=jnp.bfloat16) -> PagedKVCache:
    return PagedKVCache(
        k_pool=jnp.zeros((cfg.n_layers, n_blocks, cfg.n_kv_heads, block_size,
                          cfg.head_dim), dtype),
        v_pool=jnp.zeros((cfg.n_layers, n_blocks, cfg.n_kv_heads, block_size,
                          cfg.v_head_dim), dtype),
        block_size=block_size,
    )


def paged_write(pool, new, tables, pos_vec, block_size):
    """Scatter new KV into the pool. pool: [NBLK, KV, BS, hd] (one layer);
    new: [B, T, KV, hd]; tables: [B, MAXBLK]; pos_vec: [B]."""
    b, t, kv, hd = new.shape
    positions = pos_vec[:, None] + jnp.arange(t)[None, :]          # [B, T]
    blks = jnp.take_along_axis(tables, positions // block_size, axis=1)  # [B, T]
    offs = positions % block_size
    flat_new = new.reshape(b * t, kv, hd)
    return pool.at[blks.reshape(-1), :, offs.reshape(-1), :].set(flat_new)


def paged_gather(pool, tables):
    """Dense head-major lane view: pool [NBLK, KV, BS, hd] + tables [B, MAXBLK]
    -> [B, KV, MAXBLK*BS, hd]."""
    g = pool[tables]                      # [B, MAXBLK, KV, BS, hd]
    b, mb, kv, bs, hd = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(b, kv, mb * bs, hd)


class BlockAllocator:
    """Host-side free-list allocator with per-lane tables.

    The LAST pool block is reserved as the trash block: every unallocated
    table entry points at it, so padded prefill tails and any overflow writes
    land there instead of corrupting live blocks (their reads are masked by
    position anyway — this guards the WRITES)."""

    def __init__(self, n_blocks: int, n_lanes: int, max_blocks_per_lane: int):
        assert n_blocks >= 2, "need at least one usable block + the trash block"
        self.n_blocks = n_blocks
        self.trash_block = n_blocks - 1
        self.max_blocks_per_lane = max_blocks_per_lane
        self._free = list(range(n_blocks - 2, -1, -1))
        self._lane_blocks: dict[int, list[int]] = {i: [] for i in range(n_lanes)}
        self.tables = np.full((n_lanes, max_blocks_per_lane), self.trash_block, np.int32)

    def free_blocks(self) -> int:
        return len(self._free)

    def lane_len_capacity(self, lane: int, block_size: int) -> int:
        return len(self._lane_blocks[lane]) * block_size

    def can_allocate(self, n: int) -> bool:
        return len(self._free) >= n

    def ensure(self, lane: int, n_positions: int, block_size: int) -> bool:
        """Grow lane's table to cover n_positions; False if pool exhausted."""
        need = -(-n_positions // block_size)
        have = len(self._lane_blocks[lane])
        if need > self.max_blocks_per_lane:
            return False
        while have < need:
            if not self._free:
                return False
            blk = self._free.pop()
            self._lane_blocks[lane].append(blk)
            self.tables[lane, have] = blk
            have += 1
        return True

    def release(self, lane: int) -> None:
        blocks = self._lane_blocks[lane]
        self._free.extend(reversed(blocks))
        self._lane_blocks[lane] = []
        self.tables[lane, :] = self.trash_block
