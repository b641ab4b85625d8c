"""Profiling helpers: jax.profiler traces + throughput accounting.

The reference logs tokens/s and model bandwidth per batch
(ref inference.py:693-705) and nothing else; here the same counters plus an
xplane trace capture for deep dives (view with tensorboard or xprof)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace around a block: `with trace(): step()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling decode-throughput accounting (tokens/s, audio-s/s, bandwidth)."""

    def __init__(self, param_bytes: int = 0, frame_rate: float = 44100 / 2048):
        self.param_bytes = param_bytes
        self.frame_rate = frame_rate
        self.reset()

    def reset(self):
        self.tokens = 0
        self.t0 = time.perf_counter()

    def add(self, n_tokens: int):
        self.tokens += n_tokens

    def report(self) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        tok_s = self.tokens / dt
        return {
            "tokens_per_s": tok_s,
            "audio_s_per_s": tok_s / self.frame_rate,
            "bandwidth_gb_s": self.param_bytes * tok_s / 1e9,
            "wall_s": dt,
        }
