"""The three cached-decode layer-stack modes (scan xs/ys, python-unrolled,
carry with dynamic-layer-index in-place updates) must be numerically
IDENTICAL: they reorder buffer traffic, not math."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.decode import SamplingConfig, generate
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.ops.sampling import semantic_logit_bias

from ref_harness import random_lm_prompt

IM_END = 4


def _run(cfg, params, prompt, bias, starts):
    codes, lengths = generate(
        params, cfg, jnp.asarray(prompt), starts,
        jax.random.key(0), SamplingConfig.create(), bias,
        max_new_tokens=8, im_end_id=IM_END, greedy=True, cache_len=64)
    return np.asarray(codes), np.asarray(lengths)


@pytest.mark.parametrize("kv_dtype", ["native", "int8"])
def test_stack_modes_identical(kv_dtype):
    base = dataclasses.replace(tiny_dual_ar_config(), kv_cache_dtype=kv_dtype)
    params = init_dual_ar_params(jax.random.key(0), base)
    bias = semantic_logit_bias(base.vocab_size, base.semantic_begin_id,
                               base.semantic_end_id, IM_END)
    rng = np.random.default_rng(11)
    # batch of 2 with different left-pad offsets: exercises the per-row
    # scatter path inside the scheduler-style decode too
    p0 = random_lm_prompt(base, 10, rng)
    p1 = random_lm_prompt(base, 10, rng)
    prompt = np.stack([p0, p1])
    starts = jnp.asarray([0, 3], jnp.int32)

    outs = {}
    for mode in ("scan", "carry", "unrolled"):
        cfg = dataclasses.replace(base, decode_stack_mode=mode)
        outs[mode] = _run(cfg, params, prompt, bias, starts)

    for mode in ("carry", "unrolled"):
        np.testing.assert_array_equal(outs[mode][0], outs["scan"][0],
                                      err_msg=f"{kv_dtype}/{mode} codes")
        np.testing.assert_array_equal(outs[mode][1], outs["scan"][1],
                                      err_msg=f"{kv_dtype}/{mode} lengths")


def test_carry_mode_in_batcher_scatter_path():
    """The continuous batcher decodes slots at different positions (per-row
    scatter writes); carry mode must reproduce scan mode there too."""
    from fish_speech_tpu.engine.scheduler import ContinuousBatcher, SlotRequest

    rng = np.random.default_rng(12)
    base = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), base)
    bias = semantic_logit_bias(base.vocab_size, base.semantic_begin_id,
                               base.semantic_end_id, IM_END)
    prompts = [random_lm_prompt(base, t, rng) for t in (9, 17)]

    def run(mode):
        cfg = dataclasses.replace(base, decode_stack_mode=mode)
        batcher = ContinuousBatcher(
            params, cfg, num_slots=2, cache_len=64, im_end_id=IM_END,
            bias=bias, greedy=True, prompt_bucket=32, seed=5)
        reqs = [SlotRequest(request_id=i, prompt=p, max_new_tokens=7)
                for i, p in enumerate(prompts)]
        return batcher.run(reqs)

    scan_out, carry_out = run("scan"), run("carry")
    for i in scan_out:
        np.testing.assert_array_equal(carry_out[i], scan_out[i])


def test_unrolled_fast_sweeps_bit_identical():
    """unroll_fast_sweeps=True must reproduce the scan form's SAMPLED stream
    exactly (same RNG split chain, static positions fold to constants)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from ref_harness import random_lm_prompt

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(4), cfg)
    prompt = random_lm_prompt(cfg, 10, np.random.default_rng(11))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(c):
        codes, _ = generate(
            params, c, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(3), SamplingConfig.create(), bias,
            max_new_tokens=7, im_end_id=4, cache_len=64)
        return np.asarray(codes)

    base = run(cfg)
    unrolled = run(dataclasses.replace(cfg, unroll_fast_sweeps=True))
    np.testing.assert_array_equal(base, unrolled)

    # and with the int8 fast cache active
    base8 = run(dataclasses.replace(cfg, kv_cache_dtype="int8"))
    unrolled8 = run(dataclasses.replace(cfg, kv_cache_dtype="int8",
                                        unroll_fast_sweeps=True))
    np.testing.assert_array_equal(base8, unrolled8)
