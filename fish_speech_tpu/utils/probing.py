"""Steady-state impl probing shared by bench.py and TTSEngine.

The remote TPU runtime charges a one-time ~40-50 s cost on the SECOND
execution of a program containing many custom calls (COLD_START.md), so a
fair steady-state comparison needs >=2 host-synced warmup calls per
candidate before timing. Keeping ONE implementation of that policy stops
the bench and the serving engine from drifting apart (round-4 review)."""

from __future__ import annotations

import time
from typing import Callable


def steady_state_winner(candidates: "dict[str, Callable[[], object]]", *,
                        warmup_calls: int = 2, timed_calls: int = 2,
                        on_result: Callable | None = None):
    """Each candidate is a zero-arg callable performing ONE host-synced
    invocation of its program (the call must not return until the device
    finished — fetch a scalar, not block_until_ready). Returns
    (winner_name, {name: seconds_per_call}); failing candidates score inf.
    """
    results: dict[str, float] = {}
    errors: dict[str, Exception] = {}
    for name, call in candidates.items():
        try:
            for _ in range(warmup_calls):
                call()
            t0 = time.perf_counter()
            for _ in range(timed_calls):
                call()
            results[name] = (time.perf_counter() - t0) / timed_calls
        except Exception as e:  # scored inf; kept for the all-failed error
            results[name] = float("inf")
            errors[name] = e
        if on_result is not None:
            on_result(name, results[name])
    winner = min(results, key=results.get)
    if results[winner] == float("inf"):
        # every candidate failed: installing any of them would defer the
        # failure to the first user request with the probe exception lost
        raise RuntimeError(
            "all probe candidates failed: "
            + "; ".join(f"{n}: {e!r}" for n, e in errors.items())
        ) from next(iter(errors.values()), None)
    return winner, results
