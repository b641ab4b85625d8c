"""Pallas TPU kernel: KV-cache decode attention (single query position).

Replaces the XLA einsum chain for the decode hot loop (the reference leans on
torch SDPA with a forced MATH backend per step, ref inference.py:210;
llama.py:909-933). One fused kernel per (batch row, kv head):

  - the query group (G = n_head/n_kv_heads rows) and that head's full cache
    stripe live in VMEM (S*D*2B*2 ≈ 0.5 MB at S=1024, far under the 16 MB
    budget), so there is exactly one HBM read of K and V and no materialized
    (B, H, S) score tensor in HBM;
  - per-row validity (cache fill level and left-pad offset, for continuous
    batching) is applied inside the kernel from scalar-prefetched bounds;
  - softmax in fp32, output in the cache dtype.

Shapes: q (B, Hkv, G, D); k/v cache (B, Hkv, S, D); lengths/starts (B,).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(bounds_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)          # (G, D)
    k = k_ref[0, 0].astype(jnp.float32)          # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)          # (S, D)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (G, S)
    length = bounds_ref[b, 0]
    start = bounds_ref[b, 1]
    pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    valid = (pos < length) & (pos >= start)
    s = jnp.where(valid, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                            lengths: jax.Array, starts: jax.Array,
                            interpret: bool | None = None) -> jax.Array:
    """q: (B, Hkv, G, D); k/v: (B, Hkv, S, D); lengths/starts: (B,) int32.
    Returns (B, Hkv, G, D) in q.dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_cache.shape[2]
    scale = 1.0 / math.sqrt(d)
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)  # (B, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
    )
    return pl.pallas_call(
        partial(_decode_attn_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        interpret=interpret,
    )(bounds, q, k_cache, v_cache)


def xla_decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                         lengths: jax.Array, starts: jax.Array) -> jax.Array:
    """Reference XLA path with identical semantics (used on CPU + in tests)."""
    b, hkv, g, d = q.shape
    s = k_cache.shape[2]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhgd,bhkd->bhgk", q, k_cache) * scale
    pos = jnp.arange(s, dtype=jnp.int32)
    valid = ((pos[None, :] < lengths[:, None])
             & (pos[None, :] >= starts[:, None]))  # (B, S)
    scores = jnp.where(valid[:, None, None, :], scores.astype(jnp.float32),
                       jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhgk,bhkd->bhgd", probs, v_cache)
