"""Fused top-k / top-p / temperature sampling + RAS (Repetition-Aware Sampling).

Exact-semantics TPU redesign of the reference sampler
(/root/reference/fish_speech/models/text2semantic/inference.py:43-93,120-144):

The reference sorts the *full* vocabulary, cumsums softmax probabilities, and
scatters a keep-mask back — O(V log V) work per step. Observe that the joint
top-p/top-k mask only ever keeps indices inside the top-`top_k` entries, so:

  1. one `logsumexp` over the vocab gives the exact full-softmax denominator,
  2. `lax.top_k` (O(V log k)) extracts the only candidates that can survive,
  3. the top-p cumulative mask, temperature, and Gumbel-max draw all happen on
     the tiny (top_k,)-sized candidate set.

This matches the reference's distribution exactly (same mask, same
renormalization) at a fraction of the memory traffic — no full-vocab sort, no
scatter. Gumbel-max replicates `multinomial_sample_one_no_sync`
(argmax of probs/(-log u) with u~U(0,1)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

RAS_WIN_SIZE = 10     # ref inference.py:49
RAS_HIGH_TEMP = 1.0   # ref inference.py:50
RAS_HIGH_TOP_P = 0.9  # ref inference.py:51


def _per_row(x) -> jax.Array:
    """Normalize a sampling param to broadcast over (B, k): scalar stays
    scalar, per-row (B,) becomes (B, 1)."""
    x = jnp.asarray(x, jnp.float32)
    return x[:, None] if x.ndim == 1 else x


def _mask_topk_rows(vals: jax.Array, top_k_row) -> jax.Array:
    """Per-row effective top-k inside a static top-k ROOF: `vals` is the
    (B, roof) descending candidate matrix; masking positions >= k_row to
    -inf is bit-identical to having extracted lax.top_k(logits, k_row)
    (later candidates never influence the kept prefix's cumsum). Lets one
    compiled program serve requests with different top_k (scheduler path).
    top_k_row: None (no-op), scalar, or (B,) int."""
    if top_k_row is None:
        return vals
    k = jnp.asarray(top_k_row, jnp.int32)
    pos = jnp.arange(vals.shape[-1], dtype=jnp.int32)
    keep = pos[None, :] < (k[:, None] if k.ndim == 1 else k)
    return jnp.where(keep, vals, -jnp.inf)


def sample_one(key: jax.Array, logits: jax.Array, temperature: jax.Array,
               top_p: jax.Array, top_k: int,
               top_k_row=None) -> jax.Array:
    """Sample one token per row. logits: (B, V) fp32; temperature/top_p may
    be scalars or per-row (B,). Returns (B,) int32."""
    logits = logits.astype(jnp.float32)
    z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)          # full softmax Z
    vals, idx = jax.lax.top_k(logits, top_k)                       # (B, k) desc
    vals = _mask_topk_rows(vals, top_k_row)
    cum = jnp.cumsum(jnp.exp(vals - z), axis=-1)
    remove = cum > _per_row(top_p)
    remove = remove.at[:, 0].set(False)                            # always keep top-1
    cand = jnp.where(remove, -jnp.inf, vals)
    cand = cand / jnp.clip(_per_row(temperature), 1e-5, None)
    probs = jax.nn.softmax(cand, axis=-1)
    u = jax.random.uniform(key, probs.shape, minval=jnp.finfo(jnp.float32).tiny,
                           maxval=1.0)
    choice = jnp.argmax(probs / -jnp.log(u), axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def greedy_one(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_main_and_high(key: jax.Array, logits: jax.Array,
                         temperature: jax.Array, top_p: jax.Array,
                         top_k: int, top_k_row=None):
    """Draw the normal-params sample AND the RAS high-temperature fallback
    from ONE top-k/logsumexp pass (the candidate set is identical for both;
    the reference runs two full passes, inference.py:120-132). Distributions
    match two independent `sample_one` calls exactly."""
    logits = logits.astype(jnp.float32)
    z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    vals, idx = jax.lax.top_k(logits, top_k)
    vals = _mask_topk_rows(vals, top_k_row)
    cum = jnp.cumsum(jnp.exp(vals - z), axis=-1)

    def draw(k, temp, tp):
        remove = cum > _per_row(tp)
        remove = remove.at[:, 0].set(False)
        cand = jnp.where(remove, -jnp.inf, vals) / jnp.clip(_per_row(temp),
                                                            1e-5, None)
        probs = jax.nn.softmax(cand, axis=-1)
        u = jax.random.uniform(k, probs.shape,
                               minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
        choice = jnp.argmax(probs / -jnp.log(u), axis=-1)
        return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

    k1, k2 = jax.random.split(key)
    return (draw(k1, temperature, top_p),
            draw(k2, jnp.float32(RAS_HIGH_TEMP), jnp.float32(RAS_HIGH_TOP_P)))


def sampling_probs(logits: jax.Array, temperature: jax.Array,
                   top_p: jax.Array, top_k: int) -> jax.Array:
    """Full-vocab probability vector this sampler draws from (candidate probs
    scattered back) — used to verify distribution parity against the
    reference's `logits_to_probs` (inference.py:54-77) without randomness."""
    logits = logits.astype(jnp.float32)
    z = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    vals, idx = jax.lax.top_k(logits, top_k)
    cum = jnp.cumsum(jnp.exp(vals - z), axis=-1)
    remove = (cum > _per_row(top_p)).at[:, 0].set(False)
    cand = jnp.where(remove, -jnp.inf, vals) / jnp.clip(_per_row(temperature),
                                                        1e-5, None)
    probs = jax.nn.softmax(cand, axis=-1)
    full = jnp.zeros_like(logits)
    return jnp.put_along_axis(full, idx, probs, axis=-1, inplace=False)


@partial(jax.jit, static_argnames=("top_k", "greedy"))
def sample_token(key: jax.Array, logits: jax.Array, temperature: jax.Array,
                 top_p: jax.Array, top_k: int = 30, greedy: bool = False) -> jax.Array:
    if greedy:
        return greedy_one(logits)
    return sample_one(key, logits, temperature, top_p, top_k)


def ras_select(token_normal: jax.Array, token_high: jax.Array,
               prev_window: jax.Array, semantic_begin: int,
               semantic_end: int) -> jax.Array:
    """Repetition-aware fallback (ref inference.py:134-144), branch-free.

    token_*: (B,); prev_window: (B, W) of recent main tokens.
    Use the high-temperature sample iff the normal one is a semantic token
    already present in the window.
    """
    in_window = jnp.any(prev_window == token_normal[:, None], axis=-1)
    is_semantic = (token_normal >= semantic_begin) & (token_normal <= semantic_end)
    return jnp.where(in_window & is_semantic, token_high, token_normal)


def push_window(prev_window: jax.Array, token: jax.Array) -> jax.Array:
    """Roll the RAS window left and insert `token` at the end (ref 227-229)."""
    return jnp.concatenate([prev_window[:, 1:], token[:, None]], axis=-1)


def semantic_logit_bias(vocab_size: int, semantic_begin: int, semantic_end: int,
                        im_end_id: int) -> jax.Array:
    """(V,) additive bias: 0 inside the semantic range + im_end, -inf outside
    (constrained decoding; ref inference.py:308-320)."""
    import numpy as np

    bias = np.full((vocab_size,), -np.inf, dtype=np.float32)
    bias[semantic_begin:semantic_end + 1] = 0.0
    bias[im_end_id] = 0.0
    return jnp.asarray(bias)
