"""Sharding tests on the 8-device virtual CPU mesh (DP x TP)."""

import sys
from pathlib import Path

import numpy as np

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_dryrun_multichip(capfd):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    # XLA logs "[SPMD] Involuntary full rematerialization" to fd 2 when GSPMD
    # falls back to replicate+slice at a sharding boundary (a per-step
    # all-gather tax on real hardware). The fast-head entry stages its
    # reshard explicitly (models/dual_ar.py forward_generate_fast); keep the
    # TP programs free of such fallbacks.
    captured = capfd.readouterr()
    assert "Involuntary full rematerialization" not in captured.err


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


def test_tp_quantized_serving_config_matches_single_device():
    """The FULL fast serving config — int8 weights + W8A8 + position-major
    int8 KV cache + streaming Pallas decode attention + fused fast head —
    sharded DPxTP over the 8-device mesh must produce the single-device
    greedy stream exactly (VERDICT r1 item 1)."""
    import dataclasses

    import jax.numpy as jnp

    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from fish_speech_tpu.parallel.mesh import (
        MeshConfig, create_mesh, shard_dual_ar_params)
    from fish_speech_tpu.parallel.tp import decode_mesh
    from ref_harness import random_lm_prompt

    base = dataclasses.replace(
        tiny_dual_ar_config(),
        n_head=8, n_local_heads=4, dim=128, head_dim=16,
        intermediate_size=256, max_seq_len=64,
        # fast stack in the fused kernel's "3x" family
        fast_dim=64, fast_n_head=4, fast_n_local_heads=4, fast_head_dim=16,
        fast_intermediate_size=192,
        w8a8_matmuls=True, kv_cache_dtype="int8", kv_cache_layout="pos",
        use_pallas_attention=True, pallas_attn_block_rows=2,
        pallas_attn_stream=True, pallas_attn_int8_scores=True,
        unroll_fast_sweeps=True)
    params = quantize_lm_params(
        init_dual_ar_params(jax.random.key(0), base))
    params = enable_fused_fast_head(params)
    rng = np.random.default_rng(7)
    prompt = np.stack([random_lm_prompt(base, 12, rng) for _ in range(2)])

    import jax.numpy as jnp
    bias = semantic_logit_bias(base.vocab_size, base.semantic_begin_id,
                               base.semantic_end_id, 4)

    def run(p, cfg):
        codes, lengths = generate(
            p, cfg, jnp.asarray(prompt), jnp.zeros((2,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=6, im_end_id=4, greedy=True, cache_len=64)
        return np.asarray(codes)

    single = run(params, base)

    mesh = create_mesh(MeshConfig(data=2, model=4))
    cfg_tp = dataclasses.replace(base, tp_shards=4)
    with decode_mesh(mesh):
        sharded_params = shard_dual_ar_params(params, mesh)
        sharded = run(sharded_params, cfg_tp)

    np.testing.assert_array_equal(single, sharded)


def test_quantized_param_specs_descend():
    """dual_ar_param_specs must mirror quantized {"q","s"}/{"q","gs"}
    subtrees (round-1 VERDICT: it crashed on quantized pytrees)."""
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from fish_speech_tpu.parallel.mesh import (
        MeshConfig, create_mesh, shard_dual_ar_params)

    cfg = tiny_dual_ar_config()
    params = quantize_lm_params(init_dual_ar_params(jax.random.key(0), cfg))
    mesh = create_mesh(MeshConfig(data=2, model=4))
    sharded = shard_dual_ar_params(params, mesh)  # must not raise
    assert sharded["layers"]["attention"]["wqkv"]["q"].shape == \
        params["layers"]["attention"]["wqkv"]["q"].shape

    # int4 groupwise variant
    params4 = quantize_lm_params(
        init_dual_ar_params(jax.random.key(0), cfg), mode="int4",
        groupsize=16)
    shard_dual_ar_params(params4, mesh)

    # w4a8 nibble-packed variant ({"q4","gs"} leaves, ADVICE r4 medium):
    # spec tree must use the q4 key, and the packed inner/2 axis must stay
    # replicated (split-half packing breaks contiguous inner-dim splits)
    from jax.sharding import PartitionSpec as P
    from fish_speech_tpu.parallel.mesh import dual_ar_param_specs
    params48 = quantize_lm_params(
        init_dual_ar_params(jax.random.key(0), cfg), mode="w4a8",
        groupsize=16)
    specs48 = dual_ar_param_specs(params48)
    w2 = specs48["layers"]["feed_forward"]["w2"]
    assert set(w2) == {"q4", "gs"}
    assert w2["q4"][-1] is None  # packed axis replicated
    sharded48 = shard_dual_ar_params(params48, mesh)
    assert sharded48["layers"]["feed_forward"]["w2"]["q4"].shape == \
        params48["layers"]["feed_forward"]["w2"]["q4"].shape


def test_tp_w4a8_decode_matches_single_device():
    """w4a8 ({"q4","gs"}) checkpoints must also serve under TP: greedy
    stream sharded DPxTP == single-device (ADVICE r4 medium — weight
    placement used to crash on the q4 pytree)."""
    import dataclasses

    import jax.numpy as jnp

    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from fish_speech_tpu.parallel.mesh import (
        MeshConfig, create_mesh, shard_dual_ar_params)
    from ref_harness import random_lm_prompt

    cfg = dataclasses.replace(
        tiny_dual_ar_config(),
        n_head=8, n_local_heads=4, fast_n_head=4, fast_n_local_heads=4,
        dim=128, head_dim=16, fast_dim=64, fast_head_dim=16,
        w8a8_matmuls=True)
    params = quantize_lm_params(
        init_dual_ar_params(jax.random.key(0), cfg), mode="w4a8",
        groupsize=16)
    prompt = random_lm_prompt(cfg, 12, np.random.default_rng(3))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(p):
        import jax.numpy as jnp
        codes, _ = generate(
            p, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=5, im_end_id=4, greedy=True)
        return np.asarray(codes)

    single = run(params)
    mesh = create_mesh(MeshConfig(data=2, model=4))
    with jax.sharding.set_mesh(mesh):
        sharded = run(shard_dual_ar_params(params, mesh))
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
