"""LR schedules mirroring the reference factories
(/root/reference/fish_speech/scheduler.py:4-40), as optax schedules."""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_warmup_schedule(base_lr: float, num_warmup_steps: int,
                           num_training_steps: int, num_cycles: float = 0.5,
                           final_lr_ratio: float = 0.0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cosine = 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        cosine = jnp.maximum(final_lr_ratio, cosine)
        return base_lr * jnp.where(step < num_warmup_steps, warmup, cosine)

    return schedule


def constant_warmup_schedule(base_lr: float, num_warmup_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / jnp.maximum(1.0, num_warmup_steps)
        return base_lr * jnp.where(step < num_warmup_steps, warmup, 1.0)

    return schedule
