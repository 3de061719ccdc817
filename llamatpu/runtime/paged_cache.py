"""Paged KV cache: a shared block pool + per-lane block tables.

North-star feature (BASELINE.json: "flash-style attention over an HBM-resident
paged KV-cache") with no reference counterpart (the reference preallocates
[nLayers][ctx*kvDim] per conversation, State.java:44-45): serving memory scales
with tokens actually in flight instead of lanes x max-context, so more/longer
sequences fit per chip.

Device side: one packed pool [L, NBLK, KV, BS, hd+vhd]; writes scatter (block, offset)
computed from absolute position; attention gathers the lane's table into a
dense head-major view and reuses the standard masked-attention path (positions
beyond the lane's length are masked, so stale/foreign block contents are
harmless). Host side: a free-list BlockAllocator grows each lane's table on
demand and recycles blocks when lanes finish.

BLOCK-LEVEL PREFIX CACHING (vLLM-style, no reference counterpart — the
reference re-ingests every prompt from pos 0, InferenceService.java:58-99):
full blocks are content-addressed by a chained digest of the token prefix they
complete. A new request whose prompt starts with an already-computed chain of
full blocks maps those blocks into its table read-only (refcounted) and
prefills only from the first novel position. Released lanes register their
verified full blocks back into the cache at refcount 0 (evictable LRU), so the
pool never shrinks: eviction reclaims cold cached blocks on demand. Exactness:
a block is only registered for positions whose KV provably holds the token fed
at that position (prompt + device-confirmed generated tokens, minus the final
token whose KV write is not guaranteed), and shared blocks are never written —
writers always start at the first non-shared (block-aligned) position.
"""
from __future__ import annotations

import hashlib
from collections import OrderedDict
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamatpu.models.config import ModelConfig


def block_hashes(tokens, block_size: int) -> list[bytes]:
    """Chained content digests, one per FULL block: hash i commits to
    tokens[0 : (i+1)*block_size] (chain = prev digest || block tokens), so a
    match at block i implies the entire prefix matches."""
    out: list[bytes] = []
    prev = b""
    for i in range(len(tokens) // block_size):
        blk = np.asarray(tokens[i * block_size : (i + 1) * block_size],
                         np.int32).tobytes()
        prev = hashlib.blake2b(prev + blk, digest_size=16).digest()
        out.append(prev)
    return out


@partial(jax.tree_util.register_dataclass,
         data_fields=["kv_pool", "scale"],
         meta_fields=["block_size"])
@dataclass
class PagedKVCache:
    # PACKED pool (models/transformer.KVCache docstring): K in lanes [0:hd],
    # V in [hd:] — the 128-exact minor dim halves attention HBM traffic and
    # the per-layer write count
    kv_pool: jax.Array  # [L, NBLK, KV, BS, hd + vhd]
    block_size: int
    # int8 mode (ops/kv_quant.py): one f32 scale per (position, kv head) for
    # K and V, stored [L, NBLK, KV, 2, BS] (row 0 = K; BS on lanes)
    scale: jax.Array | None = None

    @property
    def n_blocks(self) -> int:
        return self.kv_pool.shape[1]

    @property
    def quantized(self) -> bool:
        return self.scale is not None


def init_paged_cache(cfg: ModelConfig, n_blocks: int, block_size: int = 16,
                     dtype=jnp.bfloat16) -> PagedKVCache:
    kv = jnp.zeros((cfg.n_layers, n_blocks, cfg.n_kv_heads, block_size,
                    cfg.head_dim + cfg.v_head_dim), dtype)
    if dtype == jnp.int8:
        sshape = (cfg.n_layers, n_blocks, cfg.n_kv_heads, 2, block_size)
        return PagedKVCache(kv, block_size, jnp.zeros(sshape, jnp.float32))
    return PagedKVCache(kv, block_size)


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


def paged_write_scale(spool, snew, tables, pos_vec, block_size):
    """Scatter per-(position, head) K/V scales. spool: [NBLK, KV, 2, BS] (one
    layer); snew: [B, T, KV, 2]; tables: [B, MAXBLK]; pos_vec: [B]."""
    b, t, kv, _ = snew.shape
    positions = pos_vec[:, None] + jnp.arange(t)[None, :]
    blks = jnp.take_along_axis(tables, positions // block_size, axis=1)
    offs = positions % block_size
    return spool.at[blks.reshape(-1), :, :, offs.reshape(-1)].set(
        snew.reshape(b * t, kv, 2))


def paged_write_stacked(pool, li, new, tables, pos_vec, block_size):
    """Write into the STACKED pool [L, NBLK, KV, BS, hd] at layer li
    (carry-form scan — see models/transformer.make_layer_fn). new: [B, T, KV,
    hd]; tables: [B, MAXBLK]; pos_vec: [B].

    Decode (T == 1) uses one dynamic_update_slice per lane through the
    flattened [L*NBLK, ...] view — XLA's TPU scatter op takes ~600 us to write
    a handful of rows (measured), while dus with a computed start is cheap.
    Prefill windows (T > 1, amortized over the chunk) keep the scatter."""
    b, t, kv, hd = new.shape
    l, nblk = pool.shape[:2]
    shift = block_size.bit_length() - 1
    flat = pool.reshape((l * nblk,) + pool.shape[2:])
    if t == 1:
        for bi in range(b):
            blk = li * nblk + tables[bi, pos_vec[bi] >> shift]
            off = pos_vec[bi] & (block_size - 1)
            flat = jax.lax.dynamic_update_slice(
                flat, new[bi, 0][None, :, None, :].astype(pool.dtype),
                (blk, 0, off, 0))
    else:
        positions = pos_vec[:, None] + jnp.arange(t)[None, :]
        blks = jnp.take_along_axis(tables, positions >> shift, axis=1)
        offs = positions & (block_size - 1)
        flat = flat.at[(li * nblk + blks).reshape(-1), :, offs.reshape(-1), :].set(
            new.reshape(b * t, kv, hd).astype(pool.dtype))
    return flat.reshape(pool.shape)


def paged_write_scale_stacked(spool, li, snew, tables, pos_vec, block_size):
    """snew [B, T, KV, 2] -> stacked scale pool [L, NBLK, KV, 2, BS] at li."""
    b, t, kv, _ = snew.shape
    l, nblk = spool.shape[:2]
    shift = block_size.bit_length() - 1
    flat = spool.reshape((l * nblk,) + spool.shape[2:])
    if t == 1:
        for bi in range(b):
            blk = li * nblk + tables[bi, pos_vec[bi] >> shift]
            off = pos_vec[bi] & (block_size - 1)
            flat = jax.lax.dynamic_update_slice(
                flat, snew[bi, 0][None, :, :, None], (blk, 0, 0, off))
    else:
        positions = pos_vec[:, None] + jnp.arange(t)[None, :]
        blks = jnp.take_along_axis(tables, positions >> shift, axis=1)
        offs = positions & (block_size - 1)
        flat = flat.at[(li * nblk + blks).reshape(-1), :, :, offs.reshape(-1)].set(
            snew.reshape(b * t, kv, 2))
    return flat.reshape(spool.shape)


def paged_gather_scale(spool, tables):
    """Dense scale-row lane view matching paged_gather: spool [NBLK, KV, 2, BS]
    + tables [B, MAXBLK] -> [B, KV, 2, MAXBLK*BS]."""
    g = spool[tables]                     # [B, MAXBLK, KV, 2, BS]
    b, mb, kv, two, bs = g.shape
    return g.transpose(0, 2, 3, 1, 4).reshape(b, kv, two, mb * bs)


class BlockAllocator:
    """Host-side free-list allocator with per-lane tables + prefix cache.

    The LAST pool block is reserved as the trash block: every unallocated
    table entry points at it, so padded prefill tails and any overflow writes
    land there instead of corrupting live blocks (their reads are masked by
    position anyway — this guards the WRITES).

    Prefix-cache bookkeeping: a lane's table is [shared cached blocks][private
    blocks]. Shared blocks are refcounted and never written (writers start at
    the first private, block-aligned position). Cached blocks at refcount 0
    live in an LRU and are evicted (hash unregistered, block reused) only when
    the free list runs dry."""

    def __init__(self, n_blocks: int, n_lanes: int, max_blocks_per_lane: int):
        assert n_blocks >= 2, "need at least one usable block + the trash block"
        self.n_blocks = n_blocks
        self.trash_block = n_blocks - 1
        self.max_blocks_per_lane = max_blocks_per_lane
        self._free = list(range(n_blocks - 2, -1, -1))
        self._lane_shared: dict[int, list[int]] = {i: [] for i in range(n_lanes)}
        self._lane_blocks: dict[int, list[int]] = {i: [] for i in range(n_lanes)}
        self._cached: dict[bytes, int] = {}       # chain hash -> block id
        self._block_hash: dict[int, bytes] = {}   # block id -> chain hash
        self._ref: dict[int, int] = {}            # block id -> live refcount
        self._lru: OrderedDict[int, None] = OrderedDict()  # refcount-0 cached
        self.tables = np.full((n_lanes, max_blocks_per_lane), self.trash_block, np.int32)

    def free_blocks(self) -> int:
        """Blocks allocatable right now (truly free + evictable cached)."""
        return len(self._free) + len(self._lru)

    def cached_blocks(self) -> int:
        return len(self._cached)

    def lane_len_capacity(self, lane: int, block_size: int) -> int:
        return (len(self._lane_shared[lane]) + len(self._lane_blocks[lane])) * block_size

    def can_allocate(self, n: int) -> bool:
        return self.free_blocks() >= n

    def _pop_free(self) -> int | None:
        if self._free:
            return self._free.pop()
        if self._lru:  # evict the coldest cached block
            blk, _ = self._lru.popitem(last=False)
            h = self._block_hash.pop(blk)
            del self._cached[h]
            self._ref.pop(blk, None)
            return blk
        return None

    def acquire_prefix(self, lane: int, hashes: list[bytes], max_blocks: int) -> int:
        """Map the longest cached chain into this lane's table (read-only,
        refcounted). Returns the number of shared blocks mapped. Must be called
        before any ensure() for the lane (shared blocks lead the table)."""
        assert not self._lane_shared[lane] and not self._lane_blocks[lane]
        n = 0
        for h in hashes[:max_blocks]:
            blk = self._cached.get(h)
            if blk is None:
                break
            self._ref[blk] = self._ref.get(blk, 0) + 1
            self._lru.pop(blk, None)
            self._lane_shared[lane].append(blk)
            self.tables[lane, n] = blk
            n += 1
        return n

    def ensure(self, lane: int, n_positions: int, block_size: int) -> bool:
        """Grow lane's table to cover n_positions; False if pool exhausted."""
        need = -(-n_positions // block_size)
        shared = len(self._lane_shared[lane])
        have = shared + len(self._lane_blocks[lane])
        if need > self.max_blocks_per_lane:
            return False
        while have < need:
            blk = self._pop_free()
            if blk is None:
                return False
            self._lane_blocks[lane].append(blk)
            self.tables[lane, have] = blk
            have += 1
        return True

    def release(self, lane: int, hashes: list[bytes] | None = None) -> None:
        """Free the lane. `hashes` (chain digests of the lane's VERIFIED token
        history) registers the lane's private full blocks into the prefix
        cache; without it (or for blocks past the verified history / already
        cached under the same hash) blocks return to the free list."""
        shared = self._lane_shared[lane]
        for blk in shared:
            self._ref[blk] -= 1
            if self._ref[blk] == 0:
                del self._ref[blk]
                self._lru[blk] = None  # stays cached, now evictable
        n_shared = len(shared)
        for j, blk in enumerate(self._lane_blocks[lane]):
            idx = n_shared + j
            h = hashes[idx] if hashes is not None and idx < len(hashes) else None
            if h is not None and h not in self._cached:
                self._cached[h] = blk
                self._block_hash[blk] = h
                self._lru[blk] = None
            else:
                self._free.append(blk)
        self._lane_shared[lane] = []
        self._lane_blocks[lane] = []
        self.tables[lane, :] = self.trash_block
