"""Restricted-support sampling (logits over [semantic_begin, semantic_end] +
im_end only) must be BIT-IDENTICAL to the full-vocab biased computation:
exp(-inf) == 0 exactly, the top-k candidate set is the same, and the Gumbel
draws use the same key and (B, top_k) shape."""

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.decode import SamplingConfig, generate
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.ops.sampling import semantic_logit_bias

from ref_harness import random_lm_prompt

IM_END = 4


def _run(restrict, greedy, seed=0):
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, IM_END)
    prompt = random_lm_prompt(cfg, 12, np.random.default_rng(3))
    codes, lengths = generate(
        params, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
        jax.random.key(seed), SamplingConfig.create(), bias,
        max_new_tokens=10, im_end_id=IM_END, greedy=greedy, cache_len=64,
        restrict_sampling=restrict)
    return np.asarray(codes), np.asarray(lengths)


def test_restricted_equals_full_greedy():
    a, la = _run(True, True)
    b, lb = _run(False, True)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(la, lb)


def test_restricted_equals_full_sampled():
    for seed in (0, 1, 7):
        a, la = _run(True, False, seed)
        b, lb = _run(False, False, seed)
        np.testing.assert_array_equal(a, b, err_msg=f"seed {seed}")
        np.testing.assert_array_equal(la, lb, err_msg=f"seed {seed}")
