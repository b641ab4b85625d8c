"""LoRA tests: zero-init identity, merge effect, train step moves only LoRA."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.train.lora import (
    LoraConfig,
    init_lora_params,
    make_lora_train_step,
    merge_lora,
)
from fish_speech_tpu.train.step import TrainBatch


def _batch(cfg, b=2, t=12, seed=0):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, cfg.vocab_size, size=(b, 1, t))
    tokens[:, 0, t // 2:] = rng.integers(cfg.semantic_begin_id,
                                         cfg.semantic_end_id + 1,
                                         size=(b, t - t // 2))
    codes = rng.integers(0, cfg.codebook_size, size=(b, cfg.num_codebooks, t))
    inputs = np.concatenate([tokens, codes], axis=1).astype(np.int32)
    return TrainBatch(inputs=jnp.asarray(inputs), labels=jnp.asarray(inputs),
                      attention_masks=jnp.zeros((b, t), bool))


def test_zero_init_is_identity():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    lcfg = LoraConfig(r=4, lora_alpha=8)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    assert len(lora) > 0
    merged = merge_lora(params, lora, lcfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_targets_cover_reference_list():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    lora = init_lora_params(jax.random.key(1), params, LoraConfig())
    keys = "".join(lora.keys())
    for name in ("wqkv", "wo", "w1", "w2", "w3", "embeddings",
                 "fast_output"):
        assert name in keys, f"missing LoRA target {name}"


def test_lora_train_step_changes_output():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    lcfg = LoraConfig(r=4, lora_alpha=8)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    opt = optax.adamw(1e-2)
    opt_state = opt.init(lora)
    step = make_lora_train_step(cfg, params, lcfg, opt, remat=False)

    batch = _batch(cfg)
    lora2, opt_state, metrics = step(lora, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # b factors must move off zero
    moved = any(float(jnp.abs(v["b"]).sum()) > 0 for v in lora2.values())
    assert moved

    merged = merge_lora(params, lora2, lcfg)
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(merged)))
    assert diff > 0
