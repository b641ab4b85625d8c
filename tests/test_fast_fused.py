"""Fused fast-sweep kernel parity vs the XLA fast path (interpret on CPU)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.models.config import DualARConfig
from fish_speech_tpu.models.dual_ar import (
    KVCache, forward_generate_fast, precompute_freqs_cis, rms_norm,
)
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.ops.fast_fused import (
    FusedFastCache, fused_fast_sweep, pack_fast_stack,
)
from fish_speech_tpu.ops.quant import matmul_t, quantize_lm_params


def family_cfg():
    """Tiny config in the fused kernel's '3x' layer family."""
    return DualARConfig(
        vocab_size=128, n_layer=1, n_head=2, n_local_heads=2, dim=128,
        head_dim=64, intermediate_size=384, max_seq_len=32, rope_base=10000.0,
        codebook_size=32, num_codebooks=4, n_fast_layer=2, fast_dim=128,
        fast_n_head=2, fast_n_local_heads=2, fast_head_dim=64,
        fast_intermediate_size=384, semantic_begin_id=64, semantic_end_id=95,
        w8a8_matmuls=True, kv_cache_dtype="int8",
    )


def test_fused_sweep_matches_xla_fast_path():
    cfg = family_cfg()
    params = quantize_lm_params(
        init_dual_ar_params(jax.random.key(0), cfg, dtype=jnp.bfloat16))
    table = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                 cfg.rope_base)
    b, K = 4, cfg.num_codebooks
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((b, cfg.fast_dim)) * 0.5,
                      jnp.bfloat16) for _ in range(K)]

    # XLA reference: per-head cache scales, einsum attention
    ref_cache = KVCache.create(cfg.n_fast_layer, b, K, cfg.fast_n_local_heads,
                               cfg.fast_head_dim, dtype=jnp.int8)
    ref_logits = []
    for p in range(K):
        lg, ref_cache = forward_generate_fast(params, cfg, xs[p], ref_cache,
                                              p, table)
        ref_logits.append(np.asarray(lg, np.float32))

    packed = pack_fast_stack(params["fast_layers"])
    cache = FusedFastCache.create(cfg.n_fast_layer, K, b, cfg.fast_dim)
    for p in range(K):
        xo, cache = fused_fast_sweep(packed, xs[p], cache, table, pos=p,
                                     n_head=cfg.fast_n_head,
                                     eps=cfg.norm_eps)
        xn = rms_norm(xo, params["fast_norm"], cfg.norm_eps)
        lg = np.asarray(
            matmul_t(xn, params["fast_output"], w8a8=True), np.float32)
        ref = ref_logits[p]
        # per-row (not per-head) fast-cache scales + bf16-rounded products:
        # logits agree to quantization noise
        np.testing.assert_allclose(lg, ref, atol=0.35, rtol=0.05)
        corr = np.corrcoef(lg.ravel(), ref.ravel())[0, 1]
        assert corr > 0.999, corr


def test_fused_decode_end_to_end():
    """decode_one_token routes through the fused kernel when fast_packed is
    present; codes must be valid and the stream deterministic."""
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head
    from fish_speech_tpu.ops.sampling import semantic_logit_bias

    cfg = family_cfg()
    params = quantize_lm_params(
        init_dual_ar_params(jax.random.key(1), cfg, dtype=jnp.bfloat16))
    fused = enable_fused_fast_head(params)
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)
    rng = np.random.default_rng(2)
    prompt = np.concatenate(
        [rng.integers(0, 32, (1, 1, 6)),
         rng.integers(0, cfg.codebook_size, (1, cfg.num_codebooks, 6))],
        axis=1).astype(np.int32)

    def run(p):
        codes, _ = generate(
            p, cfg, jnp.asarray(prompt), jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=4, im_end_id=4, greedy=True, cache_len=32)
        return np.asarray(codes)

    out = run(fused)
    assert out.shape == (1, cfg.num_codebooks + 1, 4)
    assert (out[:, 1:] >= 0).all() and (out[:, 1:] < cfg.codebook_size).all()
    np.testing.assert_array_equal(out, run(fused))  # deterministic
