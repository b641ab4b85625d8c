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


@dataclass
class TickPlan:
    assignments: list[SlotAssignment] = field(default_factory=list)
    n_ticks: int = 1             # decode ticks to run before the next sync

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
                              temperature=a.temperature, top_p=a.top_p)
            if request_registry is not None:
                request_registry[a.request_id] = req
        batcher._assign(req, a.slot)
    if plan.n_ticks > 0 and batcher.has_active():
        # one chunked dispatch per plan: hosts stay in lockstep with a single
        # device program per sync window instead of n_ticks separate ticks
        batcher.step_chunk(plan.n_ticks)


def run_follower_loop(batcher):
    """Follower main loop: receive plans forever and mirror the leader."""
    while True:
        plan = broadcast_plan(None)
        apply_plan(batcher, plan, request_registry=None)
