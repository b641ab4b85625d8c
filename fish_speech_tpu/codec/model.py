"""Modded-DAC codec: encoder, decoder (vocoder), and top-level API.

TPU-native re-implementation of /root/reference/fish_speech/models/dac/
modded_dac.py:599-996. Channels-last (B, T, C) activations throughout; the
public API takes/returns audio as (B, T) waveforms and codes as (B, K+1, Tq)
int32, matching the reference's `DAC.encode` / `DAC.from_indices` surface.

Notes vs the reference:
- The reference constructs per-DecoderBlock transformers but never applies
  them (they are commented out of the block Sequential, modded_dac.py:742);
  we therefore build no such parameters.
- Weight-norm is folded into kernels at conversion time.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import DACConfig
from .nn import causal_conv1d, causal_conv_transpose1d, codec_transformer, residual_unit, snake
from .rvq import rvq_decode, rvq_encode

_DILATIONS = (1, 3, 9)


def encoder_block(params: dict, cfg: DACConfig, x: jax.Array, stride: int,
                  n_t_layer: int, dim: int) -> jax.Array:
    """ResidualUnits (d=1,3,9) -> Snake -> strided conv -> [transformer].
    Ref: modded_dac.py:623-667."""
    for unit, dilation in zip(params["res_units"], _DILATIONS):
        x = residual_unit(unit, x, dilation)
    x = snake(x, params["snake_alpha"])
    x = causal_conv1d(x, params["conv_w"], params["conv_b"], stride=stride)
    if n_t_layer > 0:
        tcfg = cfg.encoder_block_transformer(dim, n_t_layer)
        x = codec_transformer(params["transformer"], tcfg, x)
    return x


def encoder(params: dict, cfg: DACConfig, x: jax.Array) -> jax.Array:
    """Waveform (B, T, 1) -> latents (B, T/hop, latent_dim). Ref: 670-709."""
    x = causal_conv1d(x, params["conv_in_w"], params["conv_in_b"])
    dim = cfg.encoder_dim
    for block, stride, n_t in zip(params["blocks"], cfg.encoder_rates,
                                  cfg.encoder_transformer_layers):
        dim *= 2
        x = encoder_block(block, cfg, x, stride, n_t, dim)
    x = snake(x, params["snake_alpha"])
    x = causal_conv1d(x, params["conv_out_w"], params["conv_out_b"])
    return x


def decoder_block(params: dict, x: jax.Array, stride: int) -> jax.Array:
    """Snake -> transposed conv (k=2*stride) -> ResidualUnits (d=1,3,9).
    Ref: modded_dac.py:712-757 (in-block transformer intentionally absent)."""
    x = snake(x, params["snake_alpha"])
    x = causal_conv_transpose1d(x, params["conv_w"], params["conv_b"], stride=stride)
    for unit, dilation in zip(params["res_units"], _DILATIONS):
        x = residual_unit(unit, x, dilation)
    return x


def decoder(params: dict, cfg: DACConfig, z: jax.Array) -> jax.Array:
    """Latents (B, Tz, latent_dim) -> waveform (B, Tz*hop, 1). Ref: 760-801.

    This is the vocoder hot path: a transposed-conv upsampling pyramid
    (1536 ch @ ~86 Hz down to 96 ch @ 44.1 kHz for S2-Pro).
    """
    x = causal_conv1d(z, params["conv_in_w"], params["conv_in_b"])
    for block, stride in zip(params["blocks"], cfg.decoder_rates):
        x = decoder_block(block, x, stride)
    x = snake(x, params["snake_alpha"])
    x = causal_conv1d(x, params["conv_out_w"], params["conv_out_b"])
    return jnp.tanh(x)


class EncodeResult(NamedTuple):
    codes: jax.Array          # (B, K+1, Tq) int32
    code_lengths: jax.Array   # (B,) valid frames per batch element


def dac_encode(params: dict, cfg: DACConfig, audio: jax.Array,
               audio_lengths: jax.Array | None = None) -> EncodeResult:
    """Audio (B, T) float -> RVQ codes. Ref: modded_dac.py:874-923."""
    if audio.ndim == 2:
        audio = audio[..., None]  # (B, T, 1)
    length = audio.shape[1]
    right_pad = math.ceil(length / cfg.frame_length) * cfg.frame_length - length
    audio = jnp.pad(audio, ((0, 0), (0, right_pad), (0, 0)))
    if audio_lengths is None:
        audio_lengths = jnp.full((audio.shape[0],), length + right_pad, dtype=jnp.int32)
    z = encoder(params["encoder"], cfg, audio)
    result = rvq_encode(params["quantizer"], cfg.rvq, z)
    code_lengths = jnp.ceil(audio_lengths / cfg.frame_length).astype(jnp.int32)
    return EncodeResult(codes=result.codes, code_lengths=code_lengths)


def dac_from_indices(params: dict, cfg: DACConfig, indices: jax.Array) -> jax.Array:
    """RVQ codes (B, K+1, Tq) -> waveform (B, Tq*frame_length).
    Ref: modded_dac.py:925-927."""
    z = rvq_decode(params["quantizer"], cfg.rvq, indices)
    audio = decoder(params["decoder"], cfg, z)
    return audio[..., 0]


def dac_decode_latents(params: dict, cfg: DACConfig, z: jax.Array) -> jax.Array:
    """Latents (B, Tz, D) -> waveform (B, Tz*hop). Ref: modded_dac.py:929-946."""
    return decoder(params["decoder"], cfg, z)[..., 0]
