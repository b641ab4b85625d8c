"""Streaming vocoder: chunked codes->waveform, exactly equal to full decode.

The codec decode path is *fully causal* with a bounded look-back: the only
attention is the post-quantizer WindowLimitedTransformer (window 128 frames,
ref configs/modded_dac_vq.yaml:33) and the conv stacks add a few frames more.
Two phases, both bit-exact vs decoding the whole sequence at once:

1. prefix phase (sequence younger than history+chunk): decode the exact
   prefix, right-padded with zero codes to a chunk-multiple — causality means
   right padding cannot affect earlier samples (the tested streaming-prefix
   invariant);
2. window phase: decode a fixed-size (history+chunk) window and keep only the
   new tail — `history` >= attention window + conv receptive field, so the
   dropped left context is invisible to the emitted frames.

Static shapes: ~(history/chunk + 2) compiled programs total. This is what
lets serving emit audio per LM segment with chunks that concatenate without
clicks (the reference decodes whole segments only,
inference_engine/__init__.py:179-192).
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np
import jax.numpy as jnp

from .config import DACConfig
from .model import dac_from_indices

# attention window (128) + upsample/conv receptive field slack, in frames
DEFAULT_HISTORY = 160


class StreamingVocoder:
    """Stateful codes->audio streamer. Feed codes incrementally; the yielded
    chunks concatenate to exactly the full-decode output."""

    def __init__(self, params: dict, cfg: DACConfig, chunk_frames: int = 64,
                 history_frames: int = DEFAULT_HISTORY):
        self.params = params
        self.cfg = cfg
        self.chunk = chunk_frames
        # round history up to a chunk multiple so phase boundaries align
        self.history = -(-history_frames // chunk_frames) * chunk_frames
        self._window_len = self.history + chunk_frames
        self._codes: np.ndarray | None = None
        self._emitted = 0
        self._decode = jax.jit(lambda p, c: dac_from_indices(p, cfg, c))

    def _run(self, codes: np.ndarray) -> np.ndarray:
        wav = self._decode(self.params, jnp.asarray(codes)[None])
        return np.asarray(wav[0])

    def feed(self, codes: np.ndarray | None = None,
             final: bool = False) -> Iterator[np.ndarray]:
        """Append (K+1, t) codes (or None); yield ready audio chunks."""
        if codes is not None and codes.shape[1] > 0:
            codes = np.asarray(codes, dtype=np.int32)
            self._codes = (codes if self._codes is None else
                           np.concatenate([self._codes, codes], axis=1))
        if self._codes is None:
            return

        fl = self.cfg.frame_length
        total = self._codes.shape[1]
        while (total - self._emitted >= self.chunk) or \
                (final and total > self._emitted):
            end = min(self._emitted + self.chunk, total)
            if end <= self._window_len:
                # prefix phase: exact prefix, right-padded to a chunk multiple
                target = -(-end // self.chunk) * self.chunk
                window = np.zeros((self._codes.shape[0], target), np.int32)
                window[:, :end] = self._codes[:, :end]
                wav = self._run(window)
                yield wav[self._emitted * fl: end * fl]
            else:
                start = end - self._window_len
                window = self._codes[:, start:end]
                wav = self._run(window)
                yield wav[(self._window_len - (end - self._emitted)) * fl:]
            self._emitted = end

    def reset(self):
        self._codes = None
        self._emitted = 0
