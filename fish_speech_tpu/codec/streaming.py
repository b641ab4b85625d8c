"""Streaming vocoder: chunked codes->waveform, exactly equal to full decode.

The codec decode path is *fully causal* with a bounded look-back: the only
attention is the post-quantizer WindowLimitedTransformer (window 128 frames,
ref configs/modded_dac_vq.yaml:33) and the conv stacks add a few frames more.

Two implementations, both bit-exact vs decoding the whole sequence at once:

**Stateful (default)** — the TPU-native equivalent of the reference codec's
KV cache (`modded_dac.py:65-95` with `clear_cache`), generalized to the conv
stacks: every stride-1 causal conv carries its left context (its causal pad
is zeros, so a zero-initialized context is exact from the first chunk), every
transposed conv carries its (k - stride)-sample overlap-add tail, and each
window-limited transformer layer carries a rolling last-`window` KV cache
with absolute RoPE positions. One jitted program of static chunk shape covers
the whole stream — each emitted frame is computed exactly once (the windowed
fallback recomputes a history window per chunk, ~(history+chunk)/chunk x
redundant vocoder FLOPs — 3.5-12x at serving chunk sizes).

**Windowed (fallback / cross-check)**:
1. prefix phase (sequence younger than history+chunk): decode the exact
   prefix, right-padded with zero codes to a chunk-multiple — causality means
   right padding cannot affect earlier samples (the tested streaming-prefix
   invariant);
2. window phase: decode a fixed-size (history+chunk) window and keep only the
   new tail — `history` >= attention window + conv receptive field, so the
   dropped left context is invisible to the emitted frames.

This is what lets serving emit audio per LM segment with chunks that
concatenate without clicks (the reference decodes whole segments only,
inference_engine/__init__.py:179-192).
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import jax
import numpy as np
import jax.numpy as jnp

from .config import DACConfig, RVQConfig
from .model import dac_from_indices
from .nn import (
    apply_rotary_emb,
    conv1d,
    layer_norm,
    precompute_freqs_cis,
    rms_norm,
    snake,
)
from .rvq import _vq_lookup_sum

# attention window (128) + upsample/conv receptive field slack, in frames
DEFAULT_HISTORY = 160


# ---------------------------------------------------------------------------
# Stateful primitives: (params, state, x) -> (y, state'), all static shapes
# ---------------------------------------------------------------------------


def _stream_conv(st, x, w, b, *, dilation=1, groups=1):
    """Stride-1 causal conv with carried left context. The causal pad is
    zeros (nn.causal_conv1d), so zero-initialized context is exact from the
    first chunk. st: (B, eff_k-1, C_in) or None for k=1."""
    k = w.shape[0]
    eff = (k - 1) * dilation + 1
    if eff == 1:
        return conv1d(x, w, b, padding=(0, 0), groups=groups), st
    xin = jnp.concatenate([st, x], axis=1)
    y = conv1d(xin, w, b, dilation=dilation, groups=groups, padding=(0, 0))
    return y, xin[:, -(eff - 1):]


def _ctx(batch, length, channels, dtype=jnp.float32):
    return jnp.zeros((batch, length, channels), dtype)


def _stream_conv_transpose(st, x, w, b, *, stride):
    """Causal transposed conv with carried overlap-add tail (k - stride
    samples, bias-free; bias is added once on emit). Exact: frame i only
    contributes to outputs [i*s, i*s+k)."""
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,),
        padding=[(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, T*s + (k-s), C_out)
    t_out = x.shape[1] * stride
    tail_len = k - stride
    if tail_len > 0:
        y = y.at[:, :tail_len].add(st.astype(y.dtype))
        new_st = y[:, t_out:]
        y = y[:, :t_out]
    else:
        new_st = st
    if b is not None:
        y = y + b.astype(y.dtype)[None, None, :]
    return y, new_st


def _stream_attention(p, cfg, st, x, pos, freqs_table, window):
    """One window-limited attention layer with a rolling last-`window` KV
    cache (absolute RoPE positions; zero slots masked via key_abs >= 0)."""
    b, t, _ = x.shape
    h, d = cfg.n_head, cfg.head_dim
    qkv = x @ p["wqkv"].T
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, d)
    k = k.reshape(b, t, h, d)
    v = v.reshape(b, t, h, d)
    fc = jax.lax.dynamic_slice_in_dim(freqs_table, pos, t, axis=0)
    q = apply_rotary_emb(q, fc)
    k = apply_rotary_emb(k, fc)

    k_all = jnp.concatenate([st["k"], k], axis=1)   # (B, W+t, H, D)
    v_all = jnp.concatenate([st["v"], v], axis=1)
    new_st = {"k": k_all[:, -window:], "v": v_all[:, -window:]}

    q_abs = pos + jnp.arange(t)                      # (t,)
    key_abs = pos - window + jnp.arange(window + t)  # (W+t,)
    valid = ((key_abs[None, :] >= 0)
             & (key_abs[None, :] <= q_abs[:, None])
             & (key_abs[None, :] > q_abs[:, None] - window))
    import math as _math

    scale = 1.0 / _math.sqrt(d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_all) * scale
    scores = jnp.where(valid[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", probs, v_all).reshape(b, t, h * d)
    return y @ p["wo"].T, new_st


def _stream_transformer(params, cfg, st, x, pos, freqs_table):
    """codec_transformer with carried per-layer KV caches (ref
    modded_dac.py:65-95 KVCache semantics, absolute positions)."""
    window = cfg.window_size
    if "input_proj_w" in params:
        x = x @ params["input_proj_w"].T + params["input_proj_b"]
    new_layers = []
    for layer, lst in zip(params["layers"], st["layers"]):
        a, nls = _stream_attention(
            layer["attention"], cfg, lst,
            rms_norm(x, layer["attention_norm"], cfg.norm_eps),
            pos, freqs_table, window)
        x = x + layer["attention_ls"] * a
        from .nn import _ffn as _codec_ffn

        f = _codec_ffn(layer["feed_forward"],
                       rms_norm(x, layer["ffn_norm"], cfg.norm_eps))
        x = x + layer["ffn_ls"] * f
        new_layers.append(nls)
    x = rms_norm(x, params["norm"], cfg.norm_eps)
    if "output_proj_w" in params:
        x = x @ params["output_proj_w"].T + params["output_proj_b"]
    return x, {"layers": new_layers}


def _stream_convnext(p, st, x):
    inp = x
    dim = x.shape[-1]
    y, nst = _stream_conv(st, x, p["dwconv_w"], p["dwconv_b"], groups=dim)
    y = layer_norm(y, p["norm_w"], p["norm_b"], 1e-6)
    y = y @ p["pw1_w"] + p["pw1_b"]
    y = jax.nn.gelu(y, approximate=False)
    y = y @ p["pw2_w"] + p["pw2_b"]
    if "gamma" in p:
        y = p["gamma"] * y
    return inp + y, nst


def _stream_residual_unit(p, st, x, dilation):
    y = snake(x, p["snake1_alpha"])
    y, c1 = _stream_conv(st["c1"], y, p["conv1_w"], p["conv1_b"],
                         dilation=dilation)
    y = snake(y, p["snake2_alpha"])
    y, c2 = _stream_conv(st["c2"], y, p["conv2_w"], p["conv2_b"])
    return x + y, {"c1": c1, "c2": c2}


_DILATIONS = (1, 3, 9)


def _stream_decoder_block(p, st, x, stride):
    x = snake(x, p["snake_alpha"])
    x, tail = _stream_conv_transpose(st["tail"], x, p["conv_w"], p["conv_b"],
                                     stride=stride)
    units = []
    for unit, ust, dilation in zip(p["res_units"], st["res_units"],
                                   _DILATIONS):
        x, nust = _stream_residual_unit(unit, ust, x, dilation)
        units.append(nust)
    return x, {"tail": tail, "res_units": units}


def vocoder_stream_step(params: dict, cfg: DACConfig, state: dict,
                        codes: jax.Array, freqs_table: jax.Array):
    """One streaming decode step: codes (B, K+1, t) -> (wav (B, t*frame_len),
    state'). Bit-exact continuation of dac_from_indices (tested)."""
    rvq: RVQConfig = cfg.rvq
    q = params["quantizer"]
    semantic = jnp.clip(codes[:, :1], 0, rvq.semantic_codebook_size - 1)
    residual = jnp.clip(codes[:, 1:], 0, rvq.codebook_size - 1)
    z = (_vq_lookup_sum(semantic, q["semantic_codebooks"],
                        q["semantic_out_w"], q["semantic_out_b"])
         + _vq_lookup_sum(residual, q["residual_codebooks"],
                          q["residual_out_w"], q["residual_out_b"]))
    z, post_st = _stream_transformer(q["post_module"],
                                     rvq.pre_post_transformer,
                                     state["post_module"], z, state["pos"],
                                     freqs_table)
    up_st = []
    for stage, sst, factor in zip(q["upsample"], state["upsample"],
                                  reversed(rvq.downsample_factor)):
        z, tail = _stream_conv_transpose(sst["tail"], z, stage["conv_w"],
                                         stage["conv_b"], stride=factor)
        z, cst = _stream_convnext(stage["convnext"], sst["convnext"], z)
        up_st.append({"tail": tail, "convnext": cst})

    dec = params["decoder"]
    x, ci = _stream_conv(state["decoder"]["conv_in"], z, dec["conv_in_w"],
                         dec["conv_in_b"])
    blocks = []
    for block, bst, stride in zip(dec["blocks"], state["decoder"]["blocks"],
                                  cfg.decoder_rates):
        x, nbst = _stream_decoder_block(block, bst, x, stride)
        blocks.append(nbst)
    x = snake(x, dec["snake_alpha"])
    x, co = _stream_conv(state["decoder"]["conv_out"], x, dec["conv_out_w"],
                         dec["conv_out_b"])
    wav = jnp.tanh(x)[..., 0]
    new_state = {
        "pos": state["pos"] + codes.shape[-1],
        "post_module": post_st,
        "upsample": up_st,
        "decoder": {"conv_in": ci, "blocks": blocks, "conv_out": co},
    }
    return wav, new_state


def init_vocoder_state(params: dict, cfg: DACConfig, batch: int = 1,
                       dtype=jnp.float32) -> dict:
    """Zero streaming state shaped from the parameter tree."""
    rvq: RVQConfig = cfg.rvq
    q = params["quantizer"]

    def conv_ctx(w, dilation=1, width=None):
        k = w.shape[0]
        eff = (k - 1) * dilation + 1
        if eff == 1:
            return None
        return _ctx(batch, eff - 1, width if width is not None
                    else w.shape[1], dtype)

    def tconv_tail(w, stride):
        return _ctx(batch, w.shape[0] - stride, w.shape[2], dtype)

    tcfg = rvq.pre_post_transformer
    if tcfg.window_size is None:
        raise ValueError("stateful streaming needs a window-limited "
                         "post transformer (window_size set)")
    post = {"layers": [
        {"k": jnp.zeros((batch, tcfg.window_size, tcfg.n_head,
                         tcfg.head_dim), dtype),
         "v": jnp.zeros((batch, tcfg.window_size, tcfg.n_head,
                         tcfg.head_dim), dtype)}
        for _ in q["post_module"]["layers"]]}
    upsample = []
    for stage, factor in zip(q["upsample"], reversed(rvq.downsample_factor)):
        dw = stage["convnext"]["dwconv_w"]
        upsample.append({
            "tail": tconv_tail(stage["conv_w"], factor),
            # depthwise: context width is the stage's channel count
            "convnext": conv_ctx(dw, width=stage["conv_w"].shape[2]),
        })
    dec = params["decoder"]
    blocks = []
    for block, stride in zip(dec["blocks"], cfg.decoder_rates):
        units = []
        for unit, dilation in zip(block["res_units"], _DILATIONS):
            units.append({
                "c1": conv_ctx(unit["conv1_w"], dilation),
                "c2": conv_ctx(unit["conv2_w"]),
            })
        blocks.append({"tail": tconv_tail(block["conv_w"], stride),
                       "res_units": units})
    return {
        "pos": jnp.int32(0),
        "post_module": post,
        "upsample": upsample,
        "decoder": {
            "conv_in": conv_ctx(dec["conv_in_w"]),
            "blocks": blocks,
            "conv_out": conv_ctx(dec["conv_out_w"]),
        },
    }


from functools import lru_cache


@lru_cache(maxsize=8)
def _shared_stream_step(cfg: DACConfig):
    """One jitted stream-step PER CONFIG, shared by every StatefulVocoder
    instance: a per-instance jax.jit would retrace (and, off the persistent
    cache, recompile) the whole vocoder graph on every streaming request —
    a hidden second of time-to-first-audio per HTTP stream. The RoPE table
    is an argument (not a closure) so instances with different max_frames
    share the trace per table length."""
    return jax.jit(lambda p, st, c, fr: vocoder_stream_step(p, cfg, st, c,
                                                            fr))


class StatefulVocoder:
    """codes->audio streamer with carried conv/transformer state: each
    emitted frame is computed exactly once (no window recompute). Feed codes
    incrementally; yielded chunks concatenate to exactly the full-decode
    output. One compiled program per distinct feed width (use fixed
    chunk_frames for a single program)."""

    def __init__(self, params: dict, cfg: DACConfig, chunk_frames: int = 64,
                 max_frames: int = 16384, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.chunk = chunk_frames
        self.batch = batch
        tcfg = cfg.rvq.pre_post_transformer
        self._freqs = precompute_freqs_cis(max_frames, tcfg.head_dim,
                                           tcfg.rope_base)
        self.max_frames = max_frames
        shared = _shared_stream_step(cfg)
        self._step = lambda p, st, c: shared(p, st, c, self._freqs)
        self.state = init_vocoder_state(params, cfg, batch=batch)
        self._pending: np.ndarray | None = None
        self._fed_frames = 0
        self._finished = False

    def feed(self, codes: np.ndarray | None = None,
             final: bool = False) -> Iterator[np.ndarray]:
        """Append (K+1, t) codes (or None); yield ready audio chunks
        (1-D float arrays of chunk_frames*frame_length samples; the final
        chunk may be shorter)."""
        if self._finished:
            raise RuntimeError(
                "StatefulVocoder was flushed with final=True (carried state "
                "advanced through tail padding); call reset() before feeding "
                "a new stream.")
        if codes is not None and codes.shape[1] > 0:
            self._fed_frames += codes.shape[1]
            if self._fed_frames > self.max_frames:
                # the RoPE table is max_frames long; dynamic_slice would
                # silently clamp and corrupt positions past it
                raise ValueError(
                    f"stream exceeds max_frames={self.max_frames} "
                    f"(~{self.max_frames / self.cfg.frame_rate:.0f}s of "
                    "audio); construct StatefulVocoder with a larger "
                    "max_frames or reset() between utterances.")
            codes = np.asarray(codes, dtype=np.int32)
            self._pending = (codes if self._pending is None else
                             np.concatenate([self._pending, codes], axis=1))
        while self._pending is not None and (
                self._pending.shape[1] >= self.chunk
                or (final and self._pending.shape[1] > 0)):
            take = min(self.chunk, self._pending.shape[1])
            block = self._pending[:, :take]
            self._pending = (self._pending[:, take:]
                             if take < self._pending.shape[1] else None)
            if take < self.chunk:
                # final ragged tail: right-pad with zero codes (causality:
                # the pad cannot affect earlier samples) and trim the wav.
                # Carried state has now advanced through the padding, so the
                # stream is finished — further feed() raises until reset().
                pad = np.zeros((block.shape[0], self.chunk - take), np.int32)
                wav, self.state = self._step(
                    self.params, self.state,
                    jnp.asarray(np.concatenate([block, pad], axis=1))[None])
                self._finished = True
                yield np.asarray(wav[0])[: take * self.cfg.frame_length]
            else:
                wav, self.state = self._step(self.params, self.state,
                                             jnp.asarray(block)[None])
                yield np.asarray(wav[0])

    def reset(self):
        self.state = init_vocoder_state(self.params, self.cfg,
                                        batch=self.batch)
        self._pending = None
        self._fed_frames = 0
        self._finished = False


class StreamingVocoder:
    """Windowed codes->audio streamer (recompute-based fallback; see module
    docstring — prefer StatefulVocoder). Feed codes incrementally; the
    yielded chunks concatenate to exactly the full-decode output."""

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
