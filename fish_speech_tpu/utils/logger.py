"""Process-ranked logging (ref /root/reference/fish_speech/utils/logger.py:
RankedLogger) — prefixes multi-host log lines with the JAX process index and
supports rank-zero-only emission."""

from __future__ import annotations

import logging
import sys


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class RankedLogger(logging.LoggerAdapter):
    def __init__(self, name: str = __name__, rank_zero_only: bool = False,
                 extra=None):
        logger = logging.getLogger(name)
        if not logger.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(logging.Formatter(
                "%(asctime)s %(levelname)s %(name)s: %(message)s"))
            logger.addHandler(handler)
            logger.setLevel(logging.INFO)
        super().__init__(logger, extra or {})
        self.rank_zero_only = rank_zero_only

    def log(self, level, msg, *args, rank=None, **kwargs):
        if not self.isEnabledFor(level):
            return
        current = _process_index()
        msg = f"[rank {current}] {msg}"
        if self.rank_zero_only and current != 0:
            return
        if rank is not None and current != rank:
            return
        self.logger.log(level, msg, *args, **kwargs)


class MetricsLogger:
    """Append-only JSONL metrics sink for training runs (stands in for the
    reference's TensorBoard logger, configs/base.yaml:62-68 — plot with any
    tool that reads JSONL)."""

    def __init__(self, path):
        from pathlib import Path

        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a", buffering=1)

    def log(self, step: int, **metrics):
        import json
        import time

        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()
