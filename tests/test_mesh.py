"""Sharding tests on the 8-device virtual CPU mesh (DP x TP)."""

import sys
from pathlib import Path

import numpy as np

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    col = np.asarray(out[0])
    assert col.shape[1] == 11  # K+1 codebook rows


def test_tp_decode_matches_single_device():
    """Tensor-parallel sharded decode must produce the same greedy stream as
    unsharded execution."""
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from fish_speech_tpu.parallel.mesh import MeshConfig, create_mesh, shard_dual_ar_params
    from ref_harness import random_lm_prompt

    cfg = dataclasses.replace(
        tiny_dual_ar_config(),
        n_head=8, n_local_heads=4, fast_n_head=4, fast_n_local_heads=4,
        dim=128, head_dim=16, fast_dim=64, fast_head_dim=16)
    params = init_dual_ar_params(jax.random.key(0), cfg)
    prompt = random_lm_prompt(cfg, 12, np.random.default_rng(0))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(p):
        codes, _ = generate(
            p, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=6, im_end_id=4, greedy=True)
        return np.asarray(codes)

    single = run(params)

    mesh = create_mesh(MeshConfig(data=2, model=4))
    with jax.sharding.set_mesh(mesh):
        sharded_params = shard_dual_ar_params(params, mesh)
        sharded = run(sharded_params)

    np.testing.assert_array_equal(single, sharded)


def test_unrolled_decode_matches_scan():
    """The unrolled layer loop (in-place cache) must equal the scan path."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from ref_harness import random_lm_prompt

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    prompt = random_lm_prompt(cfg, 10, np.random.default_rng(5))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(c):
        codes, _ = generate(
            params, c, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=6, im_end_id=4, greedy=True)
        return np.asarray(codes)

    scan = run(cfg)
    unrolled = run(dataclasses.replace(cfg, unrolled_decode=True))
    np.testing.assert_array_equal(scan, unrolled)
