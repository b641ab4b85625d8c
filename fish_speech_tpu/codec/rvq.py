"""Downsampling residual vector quantizer (TPU-native).

Re-implements the behavior of the reference quantizer stack
(/root/reference/fish_speech/models/dac/rvq.py:204-366 plus the external
descript-audio-codec `ResidualVectorQuantize` it builds on): one semantic
codebook (4096 entries) + N residual codebooks (1024 entries), with conv
downsample (x4 total) before quantization and transposed-conv upsample after.

Decode is the hot serving path: all N+1 codebook lookups are fused into one
gather + einsum over stacked codebook/out-proj tensors so XLA emits a single
MXU contraction instead of N small ones.

All activations are channels-last (B, T, C).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RVQConfig
from .nn import causal_conv1d, causal_conv_transpose1d, codec_transformer, convnext_block


class VQEncodeResult(NamedTuple):
    z: jax.Array        # (B, T, D) quantized continuous representation
    codes: jax.Array    # (B, K+1, Tq) codebook indices


def _vq_lookup_sum(codes: jax.Array, codebooks: jax.Array, out_w: jax.Array,
                   out_b: jax.Array) -> jax.Array:
    """Fused residual-VQ decode: sum_i out_proj_i(codebook_i[codes_i]).

    codes: (B, K, T) int; codebooks: (K, V, d); out_w: (K, d, D); out_b: (K, D).
    The K gathers + K 1x1 convs of the reference (dac ResidualVectorQuantize
    .from_codes loop) collapse into one gather and one batched contraction.
    """
    gathered = jnp.take_along_axis(
        codebooks[None],     # (1, K, V, d)
        codes[..., None],    # (B, K, T, 1)
        axis=2,
    )  # (B, K, T, d)
    z = jnp.einsum("bktd,kdD->btD", gathered, out_w)
    return z + jnp.sum(out_b, axis=0)[None, None, :]


def _normalized(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # matches torch.nn.functional.normalize (p=2)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _vq_encode_stage(z: jax.Array, codebooks: jax.Array, in_w: jax.Array,
                     in_b: jax.Array, out_w: jax.Array, out_b: jax.Array):
    """Residual-VQ encode over stacked codebooks.

    Mirrors dac VectorQuantize.decode_latents: project input to codebook dim,
    L2-normalize both sides, nearest-neighbour by euclidean distance, then
    reconstruct via out_proj; residual is updated with the reconstruction.
    z: (B, T, D). Returns (z_q_sum, codes (B, K, T)).
    """
    n_codebooks = codebooks.shape[0]
    z_q_sum = jnp.zeros_like(z)
    residual = z
    codes = []
    for i in range(n_codebooks):
        latents = residual @ in_w[i] + in_b[i]          # (B, T, d)
        enc = _normalized(latents)
        cb = _normalized(codebooks[i])                   # (V, d)
        # squared-euclidean on normalized vectors: argmax of dot product
        dist = (jnp.sum(enc * enc, axis=-1, keepdims=True)
                - 2.0 * (enc @ cb.T)
                + jnp.sum(cb * cb, axis=-1)[None, None, :])
        idx = jnp.argmin(dist, axis=-1)                  # (B, T)
        z_q_i = jnp.take(codebooks[i], idx, axis=0)      # (B, T, d)
        z_q_i = z_q_i @ out_w[i] + out_b[i]              # (B, T, D)
        z_q_sum = z_q_sum + z_q_i
        residual = residual - z_q_i
        codes.append(idx)
    return z_q_sum, jnp.stack(codes, axis=1)


def rvq_downsample(params: dict, x: jax.Array, cfg: RVQConfig) -> jax.Array:
    for stage, factor in zip(params["downsample"], cfg.downsample_factor):
        x = causal_conv1d(x, stage["conv_w"], stage["conv_b"], stride=factor)
        x = convnext_block(stage["convnext"], x)
    return x


def rvq_upsample(params: dict, x: jax.Array, cfg: RVQConfig) -> jax.Array:
    # reversed order of downsample stages (ref rvq.py:263-276)
    for stage, factor in zip(params["upsample"], reversed(cfg.downsample_factor)):
        x = causal_conv_transpose1d(x, stage["conv_w"], stage["conv_b"], stride=factor)
        x = convnext_block(stage["convnext"], x)
    return x


def rvq_decode(params: dict, cfg: RVQConfig, indices: jax.Array) -> jax.Array:
    """codes (B, K+1, Tq) -> continuous latents (B, Tq*downsample, D).

    Mirrors ref rvq.py:352-366: clamp, semantic + residual lookup-sum,
    post transformer, upsample.
    """
    semantic = jnp.clip(indices[:, :1], 0, cfg.semantic_codebook_size - 1)
    residual = jnp.clip(indices[:, 1:], 0, cfg.codebook_size - 1)

    z_sem = _vq_lookup_sum(semantic, params["semantic_codebooks"],
                           params["semantic_out_w"], params["semantic_out_b"])
    z_res = _vq_lookup_sum(residual, params["residual_codebooks"],
                           params["residual_out_w"], params["residual_out_b"])
    z = z_sem + z_res
    z = codec_transformer(params["post_module"], cfg.pre_post_transformer, z)
    return rvq_upsample(params, z, cfg)


def rvq_encode(params: dict, cfg: RVQConfig, z: jax.Array) -> VQEncodeResult:
    """Latents (B, T, D) -> codes; mirrors ref rvq.py:293-343 (eval path)."""
    original_t = z.shape[1]
    z = rvq_downsample(params, z, cfg)
    z = codec_transformer(params["pre_module"], cfg.pre_post_transformer, z)

    z_sem, sem_codes = _vq_encode_stage(
        z, params["semantic_codebooks"], params["semantic_in_w"],
        params["semantic_in_b"], params["semantic_out_w"], params["semantic_out_b"])
    z_res, res_codes = _vq_encode_stage(
        z - z_sem, params["residual_codebooks"], params["residual_in_w"],
        params["residual_in_b"], params["residual_out_w"], params["residual_out_b"])

    zq = z_sem + z_res
    codes = jnp.concatenate([sem_codes, res_codes], axis=1)
    zq = codec_transformer(params["post_module"], cfg.pre_post_transformer, zq)
    zq = rvq_upsample(params, zq, cfg)

    # pad/crop on the left to original length (ref rvq.py:325-333)
    diff = original_t - zq.shape[1]
    if diff > 0:
        zq = jnp.pad(zq, ((0, 0), (diff, 0), (0, 0)))
    elif diff < 0:
        zq = zq[:, -diff:, :]
    return VQEncodeResult(z=zq, codes=codes)
