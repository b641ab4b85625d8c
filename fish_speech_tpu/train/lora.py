"""LoRA finetuning, functional style.

The reference swaps nn.Linear/Embedding modules for loralib wrappers
(/root/reference/fish_speech/models/text2semantic/lora.py:25-91). Here LoRA
is a *separate pytree* of (A, B) factors mirroring the base params; the
forward path is unchanged — a merge function materializes W + (alpha/r)·B@A
inside the jitted step, gradients flow only into the factors, and XLA fuses
the rank-r update into the consuming matmul.

Covered weights (matching the reference's target list, lora.py:34-60):
attention wqkv/wo, mlp w1/w2/w3 in both stacks, fast_output, output (untied),
and the three embedding tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0  # applied by the caller on inputs if desired

    @property
    def scale(self) -> float:
        return self.lora_alpha / self.r


_TARGET_LEAVES = {"wqkv", "wo", "w1", "w2", "w3"}
_TARGET_TOP = {"embeddings", "codebook_embeddings", "fast_embeddings",
               "output", "fast_output"}


def _is_target(path) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    leaf = keys[-1]
    if leaf in _TARGET_LEAVES:
        return True
    return leaf in _TARGET_TOP and len(keys) == 1


def init_lora_params(key: jax.Array, params: dict, cfg: LoraConfig) -> dict:
    """Flat {keystr: {"a","b"}} dict, one entry per target weight.

    a ~ N(0, 0.02), b = 0 so training starts at the base model (loralib
    convention). A flat dict keyed by the base-tree path keeps the factors a
    plain pytree for optax while merge looks them up by path.
    """
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(key, len(leaves_with_paths))

    out = {}
    for (path, w), k in zip(leaves_with_paths, keys):
        if not _is_target(path) or w.ndim < 2:
            continue
        *batch_dims, out_dim, in_dim = w.shape
        a = (0.02 * jax.random.normal(k, (*batch_dims, cfg.r, in_dim),
                                      jnp.float32)).astype(w.dtype)
        b = jnp.zeros((*batch_dims, out_dim, cfg.r), w.dtype)
        out[jax.tree_util.keystr(path)] = {"a": a, "b": b}
    return out


def merge_lora(params: dict, lora: dict, cfg: LoraConfig) -> dict:
    """W + scale * B @ A at every target; identity elsewhere. Jit-safe."""

    def merge(path, w):
        lw = lora.get(jax.tree_util.keystr(path))
        if lw is None:
            return w
        delta = jnp.einsum("...or,...ri->...oi", lw["b"], lw["a"])
        return w + cfg.scale * delta.astype(w.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def make_lora_train_step(cfg_model, base_params: dict, lora_cfg: LoraConfig,
                         optimizer, remat: bool = True):
    """jitted (lora, opt_state, batch) -> (lora, opt_state, metrics);
    only the LoRA factors are trained (ref lit_module.py LoRA-only ckpt)."""
    from functools import partial

    import optax

    from .step import TrainBatch, dual_ar_loss

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(lora, opt_state, batch: TrainBatch):
        def loss_fn(lp):
            merged = merge_lora(jax.lax.stop_gradient(base_params), lp, lora_cfg)
            return dual_ar_loss(merged, cfg_model, batch, remat)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, metrics

    return step
