"""Training step: dual cross-entropy loss + AdamW, sharded DP x TP via pjit.

Loss semantics mirror the reference LightningModule
(/root/reference/fish_speech/models/text2semantic/lit_module.py:109-204):
  base_loss     = CE(token_logits, labels[:,0]) ignoring -100
  semantic_loss = CE(codebook_logits, labels[:,1:]) at semantic positions
  top-5 accuracy over codebook predictions (pad/ignore masked)

TPU deviation: our forward_train emits codebook logits for *every* position
(static shapes); the semantic gather of the reference becomes a loss mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.config import DualARConfig
from ..models.dual_ar import forward_train

CODEBOOK_PAD_TOKEN_ID = 0  # ref lit_module.py:10


class TrainBatch(NamedTuple):
    inputs: jax.Array           # (B, K+1, T) int32
    labels: jax.Array           # (B, K+1, T) int32, -100 = ignore
    attention_masks: jax.Array  # (B, T) bool, True at PAD positions


def _masked_ce(logits: jax.Array, labels: jax.Array, mask: jax.Array):
    """Mean CE over mask; logits (..., V), labels (...), mask (...) bool."""
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


def get_batch_logps(logits: jax.Array, labels: jax.Array,
                    average_log_prob: bool = False) -> jax.Array:
    """Per-sequence label log-probabilities (DPO-style preference scoring;
    ref lit_module.py:76-107). logits (B, T, K, V); labels (B, T, K) with
    -100 ignored. Returns (B,) sum (or mean) of per-token log-probs.

    Intentional divergence from the reference: lit_module.py's code sums
    only the LAST axis and returns (B, T), contradicting its own docstring
    (which promises per-sequence (B,) scores — the shape a standard DPO
    loss consumes). We implement the documented (B,) contract; a port of
    the reference's DPO loss must not assume drop-in shape parity."""
    assert logits.shape[:-1] == labels.shape
    loss_mask = labels != -100
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_token = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    per_token = jnp.where(loss_mask, per_token, 0.0)
    flat = per_token.reshape(per_token.shape[0], -1)
    fmask = loss_mask.reshape(loss_mask.shape[0], -1)
    total = jnp.sum(flat, axis=-1)
    if average_log_prob:
        return total / jnp.maximum(jnp.sum(fmask, axis=-1), 1)
    return total


def dual_ar_loss(params: dict, cfg: DualARConfig, batch: TrainBatch,
                 remat: bool = True):
    out = forward_train(params, cfg, batch.inputs, labels=batch.labels,
                        key_padding_mask=batch.attention_masks, remat=remat)

    token_labels = batch.labels[:, 0]                     # (B, T)
    base_mask = token_labels != -100
    base_loss = _masked_ce(out.token_logits, token_labels, base_mask)

    semantic_mask = ((token_labels >= cfg.semantic_begin_id)
                     & (token_labels <= cfg.semantic_end_id))  # (B, T)
    cb_labels = jnp.transpose(batch.labels[:, 1:], (0, 2, 1))  # (B, T, K)
    cb_mask = semantic_mask[..., None] & (cb_labels != -100)
    semantic_loss = _masked_ce(out.codebook_logits, cb_labels, cb_mask)

    # top-5 accuracy (ref lit_module.py:193-204)
    acc_mask = cb_mask & (cb_labels != CODEBOOK_PAD_TOKEN_ID)
    _, top5 = jax.lax.top_k(out.codebook_logits, 5)
    correct = jnp.any(top5 == cb_labels[..., None], axis=-1) & acc_mask
    accuracy = jnp.sum(correct) / jnp.maximum(jnp.sum(acc_mask), 1)

    loss = base_loss + semantic_loss
    metrics = {"loss": loss, "base_loss": base_loss,
               "semantic_loss": semantic_loss, "top_5_accuracy": accuracy}
    return loss, metrics


def _decay_mask(params: dict) -> dict:
    """No weight decay for biases, norms, embeddings (ref lit_module.py:44-57)."""

    def mask(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if "norm" in name or "embeddings" in name or name.endswith("_b") \
                or name.endswith("/b"):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(params: dict, schedule, weight_decay: float = 0.01,
                   b1: float = 0.9, b2: float = 0.95, clip_norm: float = 1.0):
    """AdamW matching configs/text2semantic_finetune.yaml (betas [0.9, 0.95])."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay,
                    mask=_decay_mask(params)),
    )


def make_train_step(cfg: DualARConfig, optimizer, remat: bool = True):
    """Returns jitted (params, opt_state, batch) -> (params, opt_state, metrics).

    Gradients are computed with rematerialized layer blocks
    (jax.checkpoint ≙ ref llama.py:368-370); GSPMD handles the DP x TP
    collectives from the shardings on params/batch.
    """

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch: TrainBatch):
        (_, metrics), grads = jax.value_and_grad(
            dual_ar_loss, has_aux=True)(params, cfg, batch, remat)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
