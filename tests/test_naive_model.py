"""NaiveTransformer (parallel codebook head) parity + decode smoke."""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.decode import SamplingConfig, generate
from fish_speech_tpu.models.dual_ar import forward_train
from fish_speech_tpu.models.init import convert_dual_ar_state_dict, init_dual_ar_params
from fish_speech_tpu.ops.sampling import semantic_logit_bias

from ref_harness import random_lm_prompt

GOLDEN = Path(__file__).parent / "goldens" / "lm_naive.npz"


def _cfg():
    return dataclasses.replace(tiny_dual_ar_config(), model_type="naive")


def test_naive_forward_parity():
    if not GOLDEN.exists():
        pytest.skip("goldens missing — run tests/ref_harness/gen_goldens.py naive")
    golden = np.load(GOLDEN)
    cfg = _cfg()
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("sd:")}
    params = convert_dual_ar_state_dict(sd, cfg)

    out = forward_train(params, cfg, jnp.asarray(golden["prompt"]), remat=False)
    np.testing.assert_allclose(np.asarray(out.token_logits),
                               golden["golden_token_logits"],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.codebook_logits),
                               golden["golden_codebook_logits"],
                               atol=2e-4, rtol=1e-3)


def test_naive_decode_smoke():
    cfg = _cfg()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    prompt = random_lm_prompt(cfg, 10, np.random.default_rng(0))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)
    codes, lengths = generate(
        params, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
        jax.random.key(0), SamplingConfig.create(), bias,
        max_new_tokens=5, im_end_id=4, cache_len=64)
    out = np.asarray(codes)
    assert out.shape == (1, cfg.num_codebooks + 1, 5)
    assert (out[:, 1:] >= 0).all() and (out[:, 1:] < cfg.codebook_size).all()
