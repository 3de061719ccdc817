"""Continuous batching scheduler: a request queue feeding a BatchEngine.

The reference serializes requests entirely (InferenceService.java:59
synchronized; SURVEY.md §2.8 "no KV reuse / no continuous batching"). This
scheduler is the north-star upgrade (BASELINE.json): requests join a running
batch between decode windows — a free cache lane is prefilled while other lanes
keep decoding, each lane streams tokens to its own consumer, and lanes free up
independently on stop/length.

Scheduling loop (one background thread):
  1. assign: pop pending requests into free lanes (no device work yet)
  2. prefill-interleave: advance the OLDEST prefilling lane by ONE chunk —
     a chunk costs about one weight pass, i.e. roughly one decode step, so
     running lanes are never frozen behind a long prompt (the reference
     serializes whole requests, InferenceService.java:59; a naive batcher
     serializes whole prefills — this does neither)
  3. decode: one device-side window for all active lanes; while any lane is
     still prefilling the window is capped at `interleave_decode_steps` so
     time-to-first-token stays bounded
  4. route: distribute the [W, B] token slab to per-request streams; finish
     lanes on stop token or budget; goto 1

All requests share the model's chat-format stop set (single-model server).
Per-lane sampling params are honored; per-request seeds are folded into the
shared engine rng at admission (lane streams are deterministic only for a
fixed admission schedule — inherent to continuous batching).
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field

import numpy as np

from llamatpu.runtime.batch_engine import BatchEngine


@dataclass
class BatchRequest:
    prompt_tokens: list[int]
    max_new_tokens: int
    temperature: float = 0.0
    top_p: float = 0.0
    stream: "TokenStream" = None


class TokenStream:
    """Per-request token channel: scheduler pushes ids, consumer iterates."""

    _END = object()

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self.finish_reason: str | None = None
        self.cancelled = False
        self.cached_tokens = 0  # prompt tokens served from the KV prefix cache

    def push(self, token_id: int) -> None:
        self._q.put(token_id)

    def cancel(self, reason: str = "stop") -> None:
        """Consumer-side abort (e.g. a stop string matched): the scheduler
        frees this lane at its next step; the consumer stops iterating now."""
        self.finish_reason = reason
        self.cancelled = True

    def finish(self, reason: str) -> None:
        if self.finish_reason is None:
            self.finish_reason = reason
        self._q.put(self._END)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._END:
                return
            yield item


@dataclass
class _Lane:
    req: BatchRequest | None = None
    produced: int = 0
    # verified KV history: every token whose KV provably landed in the cache
    # (prompt, then each token actually fed back to the device). The last
    # sampled token is NOT in `fed` until the next window feeds it — it sits
    # in `next_tok`. Drives paged prefix-cache block registration at release.
    fed: list = field(default_factory=list)
    next_tok: int = -1
    # chunked-prefill state: prompt tokens not yet fed + the lane's next
    # prefill write position; empty rem = prefill complete (lane decodes)
    prefill_rem: list = field(default_factory=list)
    prefill_pos: int = 0
    seq: int = 0  # assignment order (FCFS prefill advancement)


class ContinuousBatcher:
    def __init__(self, engine: BatchEngine, stop_tokens: set[int],
                 interleave_decode_steps: int = 4):
        self.engine = engine
        self.stop_tokens = set(stop_tokens)
        # decode-window cap while a prefill is in flight: one prefill chunk
        # costs ~one weight pass ~= one decode step, so TTFT for a P-token
        # prompt is ~ceil(P/chunk) * (1 + this) decode-steps
        self.interleave_decode_steps = max(1, int(interleave_decode_steps))
        self._seq = 0
        self.B = engine.batch_size
        self._lanes = [_Lane() for _ in range(self.B)]
        self._pending: queue.Queue[BatchRequest] = queue.Queue()
        self._backlog: list[BatchRequest] = []
        self._tokens = np.zeros(self.B, np.int32)
        self._pos = np.zeros(self.B, np.int32)
        self._active = np.zeros(self.B, bool)
        self._temps = np.zeros(self.B, np.float32)
        self._topps = np.zeros(self.B, np.float32)
        self._wake = threading.Event()
        self._shutdown = False
        # optional per-step timeline (bench/serving_latency.py): each entry
        # records where the step's wall time went — the serving-latency rows
        # were unexplainable without this (r4: agg 81.9 tok/s vs the 880
        # pure-decode row at the same B, adversary TTFT 23.8 s)
        self.record_timeline = False
        self.timeline: list[dict] = []
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API -------------------------------------------------------
    def submit(self, req: BatchRequest) -> TokenStream:
        req.stream = TokenStream()
        self._pending.put(req)
        self._wake.set()
        return req.stream

    def shutdown(self) -> None:
        self._shutdown = True
        self._wake.set()
        self._thread.join(timeout=5)

    # -- scheduler loop ---------------------------------------------------
    def _free_lane(self) -> int | None:
        for i, l in enumerate(self._lanes):
            if l.req is None:
                return i
        return None

    def _admit(self) -> None:
        while True:
            lane = self._free_lane()
            if lane is None:
                return
            req = self._backlog.pop(0) if self._backlog else None
            if req is None:
                try:
                    req = self._pending.get_nowait()
                except queue.Empty:
                    return
            budget = min(req.max_new_tokens,
                         self.engine.cache_len - len(req.prompt_tokens) - 2)
            if budget <= 0 or len(req.prompt_tokens) >= self.engine.cache_len:
                req.stream.finish("length")
                continue
            can_admit = getattr(self.engine, "can_admit", None)
            if can_admit is not None and not can_admit(len(req.prompt_tokens)):
                # paged pool backpressure: hold until blocks free up
                self._backlog.append(req)
                return
            reuse = 0
            acquire = getattr(self.engine, "acquire_prefix_for", None)
            if acquire is not None:  # paged engine: map cached prompt blocks
                reuse = acquire(lane, req.prompt_tokens)
                req.stream.cached_tokens = reuse
            reserve = getattr(self.engine, "reserve_lane", None)
            if reserve is not None and not reserve(lane, len(req.prompt_tokens)):
                # can_admit raced another lane's block growth: roll back this
                # lane's blocks (incl. acquired prefix refs) and hold the
                # request — admitting without the full prompt span reserved
                # would let chunked prefill fail mid-flight, which the loop's
                # catch-all would turn into truncating EVERY in-flight stream
                self.engine.release_lane(lane)
                req.stream.cached_tokens = 0
                self._backlog.append(req)
                return
            l = self._lanes[lane]
            l.req = req
            l.produced = 0
            l.fed = list(req.prompt_tokens[:reuse])
            l.next_tok = -1
            l.prefill_rem = list(req.prompt_tokens[reuse:])
            l.prefill_pos = reuse
            l.seq = self._seq
            self._seq += 1
            self._temps[lane] = req.temperature
            self._topps[lane] = req.top_p

    def _prefilling(self) -> list[int]:
        return sorted((i for i, l in enumerate(self._lanes)
                       if l.req is not None and l.prefill_rem),
                      key=lambda i: self._lanes[i].seq)

    def _advance_prefill(self, lane: int) -> None:
        """Feed ONE chunk of the lane's remaining prompt. On the final chunk
        the sampled first token goes live and the lane joins decode."""
        l = self._lanes[lane]
        c = self.engine.prefill_chunk
        chunk = l.prefill_rem[:c]
        final = len(l.prefill_rem) <= c
        tok = self.engine.prefill_lane(lane, chunk, l.prefill_pos,
                                       l.req.temperature, l.req.top_p)
        l.prefill_pos += len(chunk)
        l.prefill_rem = l.prefill_rem[len(chunk):]
        l.fed.extend(chunk)
        if not final:  # intermediate chunk: the sampled token is discarded
            return
        l.produced = 1
        l.next_tok = tok
        self._tokens[lane] = tok
        self._pos[lane] = l.prefill_pos
        l.req.stream.push(tok)
        if tok in self.stop_tokens:
            self._finish_lane(lane, "stop")
        else:
            self._active[lane] = True

    def _finish_lane(self, lane: int, reason: str) -> None:
        l = self._lanes[lane]
        if l.req is not None:
            l.req.stream.finish(reason)
        fed = l.fed
        l.req = None
        l.produced = 0
        l.fed = []
        l.next_tok = -1
        l.prefill_rem = []
        l.prefill_pos = 0
        self._active[lane] = False
        release = getattr(self.engine, "release_lane", None)
        if release is not None:
            # paged pool: recycle the lane's blocks; the verified history
            # registers its full blocks into the prefix cache
            try:
                release(lane, fed_tokens=fed)
            except TypeError:  # engine without prefix-cache support
                release(lane)

    def _loop(self) -> None:
        while not self._shutdown:
            try:
                self._step()
            except Exception:  # a scheduler crash must not strand consumers
                import traceback

                traceback.print_exc()
                for i in range(self.B):
                    if self._lanes[i].req is not None:
                        self._finish_lane(i, "length")

    def _step(self) -> None:
        import time as _time

        rec = {"t0": _time.perf_counter()} if self.record_timeline else None
        for b in range(self.B):  # consumer-side cancels free the lane here
            l = self._lanes[b]
            if l.req is not None and l.req.stream.cancelled:
                self._finish_lane(b, "stop")
        self._admit()
        prefilling = self._prefilling()
        if prefilling:
            tp0 = _time.perf_counter()
            self._advance_prefill(prefilling[0])
            if rec is not None:
                rec["prefill_s"] = _time.perf_counter() - tp0
                rec["n_prefilling"] = len(prefilling)
            prefilling = self._prefilling()
        if not self._active.any():
            if not prefilling:  # fully idle: sleep until work arrives
                self._wake.wait(timeout=0.05)
                self._wake.clear()
            elif rec is not None:
                rec["dt"] = _time.perf_counter() - rec["t0"]
                self.timeline.append(rec)
            return
        # window limit QUANTIZED to a bounded program set: every distinct
        # limit is a separate compiled program, and letting it track the
        # tightest remaining budget compiled a fresh ~30-90s program per
        # value mid-serving (r5 timeline: sched_step_max 145 s — the r4
        # latency rows were compile noise, not scheduling). Budgets are now
        # enforced HOST-SIDE when routing the slab (lanes may overshoot by
        # < window on device; dense caches carry >= granule slack rows and
        # paged overshoot lands in the trash block, so the extra writes are
        # harmless by the parking invariant).
        if not self._active.any():
            return
        limit = (self.interleave_decode_steps if prefilling
                 else self.engine.decode_window)
        # near the cache end, shrink to the pow2 floor of the tightest
        # remaining room (bounded variants: log2(window) programs, only ever
        # compiled for requests that actually run against the cache end)
        room = min(int(self.engine.cache_len) - 2 - int(self._pos[i])
                   for i in range(self.B) if self._active[i])
        while limit > 1 and limit > room:
            limit //= 2
        limit = max(1, limit)
        td0 = _time.perf_counter()
        slab = self.engine.decode_window_run(
            self._tokens, self._pos, self._active, self.stop_tokens,
            self._temps, self._topps, limit=limit)
        if rec is not None:
            rec["decode_s"] = _time.perf_counter() - td0
            rec["limit"] = int(limit)
            rec["n_active"] = int(self._active.sum())
            rec["emitted"] = int((slab >= 0).sum())
        for b in range(self.B):
            l = self._lanes[b]
            if l.req is None or not self._active[b]:
                continue
            col = slab[:, b]
            emitted = [int(t) for t in col[col >= 0]]
            # host-side budget enforcement (see limit quantization above)
            emitted = emitted[: l.req.max_new_tokens - l.produced]
            if emitted:
                # the window fed next_tok (KV written), then every emitted
                # token except the last (its KV write is not yet confirmed)
                l.fed.extend([l.next_tok] + emitted[:-1])
                l.next_tok = emitted[-1]
            stopped = False
            for t in emitted:
                l.req.stream.push(t)
                l.produced += 1
                if t in self.stop_tokens:
                    stopped = True
                    break
            self._pos[b] += len(emitted)
            if emitted:
                self._tokens[b] = emitted[-1]
            if stopped:
                self._finish_lane(b, "stop")
            elif l.produced >= l.req.max_new_tokens or self._pos[b] + 2 >= self.engine.cache_len:
                self._finish_lane(b, "length")
        if rec is not None:
            import time as _time

            rec["dt"] = _time.perf_counter() - rec["t0"]
            self.timeline.append(rec)
