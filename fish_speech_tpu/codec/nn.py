"""Functional TPU-native building blocks for the codec.

All tensors are channels-last `(B, T, C)` — the natural layout for TPU (the
lane dimension maps channels onto the 128-wide VPU/MXU). The reference keeps
channels-first torch layout (modded_dac.py); we transpose only at API edges.

Numerical parity notes (vs /root/reference/fish_speech/models/dac/):
- Causal conv pad math mirrors modded_dac.py:476-552 (left pad = effective
  kernel - stride, plus right "extra" pad for stride alignment).
- Causal transposed conv mirrors modded_dac.py:563-580 (unpad k-stride right).
- Snake activation mirrors dac.nn.layers.Snake1d: x + sin(a x)^2 / (a + 1e-9).
- RMSNorm computed in fp32 then cast back (modded_dac.py:320-331).
- RoPE tables are precomputed in fp32 then stored bf16 (modded_dac.py:442-452);
  we replicate that rounding for bit parity.
- Weight-norm is folded into plain kernels at checkpoint conversion time
  (the reference keeps it as a torch parametrization).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import CodecTransformerConfig

# ---------------------------------------------------------------------------
# Activations / norms
# ---------------------------------------------------------------------------


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation (dac.nn.layers.Snake1d). alpha: (C,)."""
    a = alpha[None, None, :]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with fp32 internal math (ref modded_dac.py:320-331)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return normed.astype(x.dtype) * weight + bias


# ---------------------------------------------------------------------------
# Causal convolutions (channels-last)
# ---------------------------------------------------------------------------

_DIMS = ("NHC", "HIO", "NHC")  # 1-D conv: batch/time/chan, kernel (k, in, out)


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None, *, stride: int = 1,
           dilation: int = 1, groups: int = 1,
           padding: tuple[int, int] = (0, 0)) -> jax.Array:
    """Plain 1-D conv. w: (k, in/groups, out)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(x.dtype)[None, None, :]
    return y


def causal_conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
                  stride: int = 1, dilation: int = 1, groups: int = 1) -> jax.Array:
    """CausalConvNet (ref modded_dac.py:521-552): left-pad so output depends
    only on past; extra right pad aligns length to stride."""
    k = w.shape[0]
    eff_k = (k - 1) * dilation + 1
    pad = eff_k - stride
    length = x.shape[1]
    # get_extra_padding_for_conv1d (ref modded_dac.py:485-492), static shapes
    n_frames = (length - eff_k + pad) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (eff_k - pad)
    extra = ideal_length - length
    return conv1d(x, w, b, stride=stride, dilation=dilation, groups=groups,
                  padding=(pad, extra))


def causal_conv_transpose1d(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
                            stride: int) -> jax.Array:
    """CausalTransConvNet (ref modded_dac.py:563-580).

    w is stored pre-transformed at conversion time as (k, in, out) with the
    spatial axis flipped relative to torch's ConvTranspose1d (in, out, k), so
    the transposed conv is expressed as an input-dilated regular conv — a form
    XLA tiles directly onto the MXU.
    Output trimmed by (k - stride) on the right (causal unpad).
    """
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMS,
    )
    if b is not None:
        y = y + b.astype(x.dtype)[None, None, :]
    trim = k - stride
    if trim > 0:
        y = y[:, :-trim, :]
    return y


# ---------------------------------------------------------------------------
# ConvNeXt block (ref rvq.py:129-191)
# ---------------------------------------------------------------------------


def convnext_block(params: dict, x: jax.Array) -> jax.Array:
    """Depthwise causal conv -> LN -> pw MLP (gelu) -> gamma -> residual."""
    inp = x
    dim = x.shape[-1]
    x = causal_conv1d(x, params["dwconv_w"], params["dwconv_b"], groups=dim)
    x = layer_norm(x, params["norm_w"], params["norm_b"], 1e-6)
    x = x @ params["pw1_w"] + params["pw1_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["pw2_w"] + params["pw2_b"]
    if "gamma" in params:
        x = params["gamma"] * x
    return inp + x


# ---------------------------------------------------------------------------
# RoPE (bf16 table, fp32 apply — ref modded_dac.py:442-467)
# ---------------------------------------------------------------------------


def precompute_freqs_cis(seq_len: int, n_elem: int, base: float = 10000.0) -> jax.Array:
    freqs = 1.0 / (base ** (np.arange(0, n_elem, 2)[: n_elem // 2].astype(np.float32) / n_elem))
    t = np.arange(seq_len, dtype=np.float32)
    angles = np.outer(t, freqs)
    cache = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(cache, dtype=jnp.bfloat16)  # (T, n_elem//2, 2)


def apply_rotary_emb(x: jax.Array, freqs_cis: jax.Array) -> jax.Array:
    """x: (B, T, H, D); freqs_cis: (T, D//2, 2)."""
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    fc = freqs_cis.astype(jnp.float32)[None, :, None, :, :]
    real = xf[..., 0] * fc[..., 0] - xf[..., 1] * fc[..., 1]
    imag = xf[..., 1] * fc[..., 0] + xf[..., 0] * fc[..., 1]
    out = jnp.stack([real, imag], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# Window-limited causal attention + transformer (ref modded_dac.py:97-439)
# ---------------------------------------------------------------------------


def _window_causal_mask(q_len: int, kv_len: int, window_size: int | None) -> np.ndarray:
    """Banded lower-triangular mask (ref modded_dac.py:380-398)."""
    rows = np.arange(q_len)[:, None]
    cols = np.arange(kv_len)[None, :]
    mask = cols <= rows
    if window_size is not None:
        valid_from = np.maximum(rows - window_size + 1, 0)
        mask &= cols >= valid_from
    return mask


def mha(q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked multi-head attention. q,k,v: (B, T, H, D); mask: (Tq, Tk) bool."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    scores = jnp.where(mask[None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _attention(params: dict, cfg: CodecTransformerConfig, x: jax.Array,
               freqs_cis: jax.Array, mask: jax.Array) -> jax.Array:
    b, t, _ = x.shape
    h, d = cfg.n_head, cfg.head_dim
    qkv = x @ params["wqkv"].T
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, h, d)
    k = k.reshape(b, t, h, d)
    v = v.reshape(b, t, h, d)
    q = apply_rotary_emb(q, freqs_cis)
    k = apply_rotary_emb(k, freqs_cis)
    y = mha(q, k, v, mask)
    y = y.reshape(b, t, h * d)
    return y @ params["wo"].T


def _ffn(params: dict, x: jax.Array) -> jax.Array:
    return (jax.nn.silu(x @ params["w1"].T) * (x @ params["w3"].T)) @ params["w2"].T


def codec_transformer(params: dict, cfg: CodecTransformerConfig, x: jax.Array) -> jax.Array:
    """WindowLimitedTransformer forward, channels-last (ref modded_dac.py:418-439).

    input/output projections are identity when input_dim == dim (the shipping
    config), matching the reference.
    """
    t = x.shape[1]
    if "input_proj_w" in params:
        x = x @ params["input_proj_w"].T + params["input_proj_b"]
    freqs_cis = precompute_freqs_cis(t, cfg.head_dim, cfg.rope_base)
    mask = jnp.asarray(_window_causal_mask(t, t, cfg.window_size))
    for layer in params["layers"]:
        a = _attention(layer["attention"], cfg,
                       rms_norm(x, layer["attention_norm"], cfg.norm_eps),
                       freqs_cis, mask)
        x = x + layer["attention_ls"] * a
        f = _ffn(layer["feed_forward"], rms_norm(x, layer["ffn_norm"], cfg.norm_eps))
        x = x + layer["ffn_ls"] * f
    x = rms_norm(x, params["norm"], cfg.norm_eps)
    if "output_proj_w" in params:
        x = x @ params["output_proj_w"].T + params["output_proj_b"]
    return x


# ---------------------------------------------------------------------------
# Residual unit / encoder / decoder blocks (ref modded_dac.py:599-801)
# ---------------------------------------------------------------------------


def residual_unit(params: dict, x: jax.Array, dilation: int) -> jax.Array:
    """Snake -> causal conv k7 (dilated) -> Snake -> conv k1, residual."""
    y = snake(x, params["snake1_alpha"])
    y = causal_conv1d(y, params["conv1_w"], params["conv1_b"], dilation=dilation)
    y = snake(y, params["snake2_alpha"])
    y = causal_conv1d(y, params["conv2_w"], params["conv2_b"])
    # causal convs preserve length at stride 1, so the residual is direct
    # (ref modded_dac.py:612-620 trims only when lengths diverge)
    pad = x.shape[1] - y.shape[1]
    if pad > 0:
        x = x[:, :-pad, :]
    return x + y
