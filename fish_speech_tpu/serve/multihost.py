"""Multi-host serving coordination (SURVEY hard part 7).

Under `jax.distributed`, every host must enter the same pjit program with the
same static shapes each tick. The scheduler's device state is already SPMD
(slot arrays sharded over `data`, weights over `model`); what must be
replicated is the *host-side plan*: which requests land in which slots, with
which bucketed prompt shapes.

Protocol (leader = process 0):
  1. leader drains its intake queue and builds a `TickPlan` — a pure-data
     description of (slot, prompt, bucket, sampling) assignments plus how
     many decode ticks to run before the next sync;
  2. the plan is broadcast to all hosts with
     `jax.experimental.multihost_utils.broadcast_one_to_all` (bytes over the
     same distributed runtime that carries the GSPMD collectives);
  3. every host applies the identical plan: the same `_assign` /`step` calls
     in the same order, so all hosts trace/execute identical programs;
  4. outputs: every host holds the full (replicated) emitted columns for its
     data-shard slots; the leader serves HTTP and owns responses.

This module is structured so the plan path is unit-testable on one host
(`plan -> bytes -> plan` and `apply_plan`); the broadcast is a thin wrapper.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np


@dataclass
class SlotAssignment:
    slot: int
    request_id: int
    prompt: np.ndarray          # (K+1, T) — already bucketed by the leader
    max_new_tokens: int
    temperature: float
    top_p: float
    # full request surface so every host runs the IDENTICAL assign path
    # (per-slot top_k device mask; prefix-cached prefill vs full prefill)
    top_k: int = 30
    prefix_id: str | None = None
    prefix_len: int = 0


@dataclass
class TickPlan:
    assignments: list[SlotAssignment] = field(default_factory=list)
    n_ticks: int = 1             # decode ticks to run before the next sync
    # slots whose requests the leader observed as cancelled: replicated in
    # the plan so every host frees the same slots the same tick (a
    # leader-local sweep would diverge device state across hosts)
    cancels: list[int] = field(default_factory=list)
    # leader shutting down: followers exit their loop
    shutdown: bool = False

    def to_bytes(self) -> bytes:
        return pickle.dumps(self)

    @staticmethod
    def from_bytes(data: bytes) -> "TickPlan":
        return pickle.loads(data)


def broadcast_plan(plan: "TickPlan | None") -> TickPlan:
    """Leader broadcasts its plan; followers receive it. Single-host: no-op."""
    import jax

    if jax.process_count() == 1:
        return plan if plan is not None else TickPlan()

    from jax.experimental import multihost_utils

    payload = plan.to_bytes() if jax.process_index() == 0 else b""
    # two-phase: size first (so followers allocate exactly), then payload —
    # no fixed-size cap on plans with many/long prompts
    size = multihost_utils.broadcast_one_to_all(
        np.int64(len(payload)))
    arr = np.zeros(int(size), np.uint8)
    if jax.process_index() == 0:
        arr[:] = np.frombuffer(payload, dtype=np.uint8)
    out = multihost_utils.broadcast_one_to_all(arr)
    return TickPlan.from_bytes(bytes(np.asarray(out).tobytes()))


def apply_plan(batcher, plan: TickPlan, request_registry: dict | None = None):
    """Apply a plan deterministically on every host.

    request_registry (leader only): request_id -> SlotRequest, so emitted
    columns reach the right response stream; followers pass None and run the
    identical device program with throwaway host bookkeeping.
    """
    from ..engine.scheduler import SlotRequest

    for a in plan.assignments:
        req = None
        if request_registry is not None:
            req = request_registry.get(a.request_id)
        if req is None:
            req = SlotRequest(request_id=a.request_id, prompt=a.prompt,
                              max_new_tokens=a.max_new_tokens,
                              temperature=a.temperature, top_p=a.top_p,
                              top_k=a.top_k, prefix_id=a.prefix_id,
                              prefix_len=a.prefix_len)
            if request_registry is not None:
                request_registry[a.request_id] = req
        try:
            batcher._assign(req, a.slot)
        except Exception as e:
            # a bad request (e.g. prompt over the largest bucket) must not
            # kill the scheduler thread / follower processes. The exception
            # is DETERMINISTIC given the plan (same prompt, same buckets on
            # every host), so every host skips the same assignment and
            # lockstep is preserved; the leader also reports the error.
            if request_registry is not None:
                req.error = e
                req.done.set()
    # replicate leader-observed cancellations: mark the slot's local request
    # cancelled so the tick-entry sweep frees the same slots on every host
    for slot in plan.cancels:
        req = batcher.slot_req[slot]
        if req is not None:
            req.cancelled.set()
    if plan.cancels:
        batcher.sweep_cancelled()
    if plan.n_ticks > 0 and batcher.has_active():
        # one chunked dispatch per plan: hosts stay in lockstep with a single
        # device program per sync window instead of n_ticks separate ticks
        batcher.step_chunk(plan.n_ticks)


def run_follower_loop(batcher, stop=None):
    """Follower main loop: receive plans forever and mirror the leader.
    `stop`: optional threading.Event-like for tests; production followers
    run until the process exits."""
    batcher.local_sweep = False  # cancellation arrives via plan only
    while stop is None or not stop.is_set():
        plan = broadcast_plan(None)
        apply_plan(batcher, plan, request_registry=None)
        if plan.shutdown:
            return


class MultihostSchedulerThread:
    """Leader-side model-owner thread for multi-host serving: the drop-in
    `SchedulerThread` counterpart whose every device action goes through a
    broadcast `TickPlan`, so follower hosts (in `run_follower_loop`) execute
    identical programs in lockstep. The reference punts multi-node serving
    to SGLang (ref README.md:130-137); here it is a served mode:
    `tools/api_server.py --multihost` (leader = process 0 owns HTTP).

    Heartbeats: followers sit inside `broadcast_one_to_all` between plans,
    so the idle leader must keep broadcasting empty plans — the interval
    bounds both follower collective-wait time and new-request latency."""

    def __init__(self, batcher, poll_s: float = 0.002,
                 chunk_steps: int = 8, heartbeat_s: float = 0.2):
        import queue as _queue
        import threading

        assert batcher.prefill_chunk is None, \
            "multihost serving does not carry chunked-prefill state in plans"
        self.batcher = batcher
        batcher.local_sweep = False  # cancellation goes through the plan
        self.queue: "_queue.Queue" = _queue.Queue()
        self.registry: dict = {}
        self.poll_s = poll_s
        self.chunk_steps = max(1, chunk_steps)
        self.heartbeat_s = heartbeat_s
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, req):
        self.queue.put(req)
        return req

    def _build_plan(self) -> TickPlan:
        import queue as _queue

        b = self.batcher
        assignments = []
        for slot in b.free_slots():
            req = None
            while req is None:
                try:
                    req = self.queue.get_nowait()
                except _queue.Empty:
                    break
                if req.cancelled.is_set():
                    b.cancelled_requests += 1
                    req.done.set()
                    req = None
            if req is None:
                break
            self.registry[req.request_id] = req
            assignments.append(SlotAssignment(
                slot=slot, request_id=req.request_id, prompt=req.prompt,
                max_new_tokens=req.max_new_tokens,
                temperature=req.temperature, top_p=req.top_p,
                top_k=req.top_k, prefix_id=req.prefix_id,
                prefix_len=req.prefix_len))
        cancels = [s for s in range(b.num_slots)
                   if b.slot_req[s] is not None
                   and b.slot_req[s].cancelled.is_set()]
        active = b.has_active() or bool(assignments)
        return TickPlan(assignments=assignments,
                        n_ticks=self.chunk_steps if active else 0,
                        cancels=cancels)

    def _loop(self):
        import time

        last_bcast = 0.0
        while not self._stop.is_set():
            plan = self._build_plan()
            busy = plan.assignments or plan.cancels or plan.n_ticks
            now = time.monotonic()
            if busy or now - last_bcast >= self.heartbeat_s:
                broadcast_plan(plan)
                apply_plan(self.batcher, plan, self.registry)
                last_bcast = now
                # drop finished requests from the registry
                for rid in [r for r, q in self.registry.items()
                            if q.done.is_set()]:
                    del self.registry[rid]
            if not busy:
                time.sleep(self.poll_s)

    def stop(self):
        self._stop.set()
        self.thread.join(timeout=10)
        if self.thread.is_alive():
            # the loop thread is still blocked inside a broadcast (e.g. a
            # follower died mid-collective). The plan channel is a two-phase
            # size/payload protocol and is NOT thread-safe: a concurrent
            # shutdown broadcast from this thread could pair the wrong size
            # with the wrong payload on surviving hosts. Leave the channel
            # alone — the process is exiting anyway.
            return
        # release followers from their blocking broadcast
        try:
            broadcast_plan(TickPlan(n_ticks=0, shutdown=True))
        except Exception:
            pass
