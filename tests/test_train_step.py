"""Training-step tests: loss semantics, grads, optimizer wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.train import (
    TrainBatch,
    cosine_warmup_schedule,
    dual_ar_loss,
    make_optimizer,
    make_train_step,
)


def _batch(cfg, b=2, t=16, seed=0):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, cfg.vocab_size, size=(b, 1, t))
    tokens[:, 0, t // 2:] = rng.integers(cfg.semantic_begin_id,
                                         cfg.semantic_end_id + 1,
                                         size=(b, t - t // 2))
    codes = rng.integers(0, cfg.codebook_size, size=(b, cfg.num_codebooks, t))
    inputs = np.concatenate([tokens, codes], axis=1).astype(np.int32)
    labels = inputs.copy()
    labels[:, :, : t // 4] = -100  # ignore a prefix
    masks = np.zeros((b, t), dtype=bool)
    masks[:, -2:] = True  # padded tail
    return TrainBatch(inputs=jnp.asarray(inputs), labels=jnp.asarray(labels),
                      attention_masks=jnp.asarray(masks))


def test_loss_finite_and_components():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    loss, metrics = dual_ar_loss(params, cfg, _batch(cfg), remat=False)
    assert np.isfinite(float(loss))
    assert float(metrics["base_loss"]) > 0
    assert float(metrics["semantic_loss"]) > 0
    assert 0.0 <= float(metrics["top_5_accuracy"]) <= 1.0


def test_train_step_updates_params():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    optimizer = make_optimizer(params, cosine_warmup_schedule(1e-3, 2, 10))
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer, remat=False)

    before = float(jnp.sum(jnp.abs(params["layers"]["attention"]["wqkv"])))
    params2, opt_state, metrics = step(params, opt_state, _batch(cfg))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))

    # LR is 0 at warmup step 0 (matches the reference lambda schedules);
    # params must move by step 2
    params3, opt_state, metrics2 = step(params2, opt_state, _batch(cfg, seed=1))
    after = float(jnp.sum(jnp.abs(params3["layers"]["attention"]["wqkv"])))
    assert np.isfinite(float(metrics2["loss"]))
    assert after != before


def test_remat_matches_no_remat():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    batch = _batch(cfg)
    l1, _ = dual_ar_loss(params, cfg, batch, remat=False)
    l2, _ = dual_ar_loss(params, cfg, batch, remat=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_get_batch_logps_matches_torch():
    """DPO-style per-sequence log-probs (ref lit_module.py:76-107) vs a
    torch implementation of the same math."""
    import torch

    from fish_speech_tpu.train.step import get_batch_logps

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 1, (2, 5, 3, 11)).astype(np.float32)
    labels = rng.integers(0, 11, (2, 5, 3)).astype(np.int64)
    labels[0, 1, :] = -100
    labels[1, :, 2] = -100

    tl = torch.from_numpy(logits)
    tlab = torch.from_numpy(labels.copy())
    mask = tlab != -100
    tlab2 = tlab.clone()
    tlab2[tlab2 == -100] = 0
    per_tok = torch.gather(tl.log_softmax(-1), dim=-1,
                           index=tlab2.unsqueeze(-1)).squeeze(-1)
    ref_sum = (per_tok * mask).reshape(2, -1).sum(-1).numpy()
    ref_avg = ((per_tok * mask).reshape(2, -1).sum(-1)
               / mask.reshape(2, -1).sum(-1)).numpy()

    got_sum = np.asarray(get_batch_logps(jnp.asarray(logits),
                                         jnp.asarray(labels)))
    got_avg = np.asarray(get_batch_logps(jnp.asarray(logits),
                                         jnp.asarray(labels),
                                         average_log_prob=True))
    np.testing.assert_allclose(got_sum, ref_sum, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_avg, ref_avg, rtol=1e-5, atol=1e-5)
