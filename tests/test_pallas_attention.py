"""Pallas decode-attention kernel parity (interpret mode on CPU)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.ops.attention import pallas_decode_attention, xla_decode_attention


def test_kernel_matches_xla_reference():
    rng = np.random.default_rng(0)
    b, hkv, g, d, s = 3, 2, 4, 32, 64
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([10, 64, 33], jnp.int32)
    starts = jnp.asarray([0, 5, 2], jnp.int32)

    a = xla_decode_attention(q, k, v, lengths, starts)
    p = pallas_decode_attention(q, k, v, lengths, starts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), atol=1e-5)


def test_full_decode_with_pallas_attention_matches():
    """use_pallas_attention=True must reproduce the einsum path's greedy
    stream (kernel integrated through the whole decode program)."""
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from ref_harness import random_lm_prompt

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    prompt = random_lm_prompt(cfg, 11, np.random.default_rng(3))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(c):
        codes, _ = generate(
            params, c, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=5, im_end_id=4, greedy=True, cache_len=64)
        return np.asarray(codes)

    base = run(cfg)
    pallas = run(dataclasses.replace(cfg, use_pallas_attention=True))
    np.testing.assert_array_equal(base, pallas)
    blocks = run(dataclasses.replace(cfg, use_pallas_attention=True,
                                     pallas_attn_block_rows=16,
                                     pallas_attn_int8_scores=False))
    np.testing.assert_array_equal(base, blocks)


def test_stacked_kernel_matches_xla_bf16_and_int8():
    """Stacked-cache kernel: reads one layer of the (L,B,H,S,D) cache in
    place; int8 mode applies per-position scales in-kernel."""
    from fish_speech_tpu.ops.attention import pallas_decode_attention_stacked

    rng = np.random.default_rng(2)
    L, b, hkv, g, d, s = 3, 4, 8, 4, 32, 256
    layer = 1
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.bfloat16)
    lengths = jnp.asarray([100, 256, 37, 130], jnp.int32)
    starts = jnp.asarray([0, 30, 5, 0], jnp.int32)

    kf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    out = pallas_decode_attention_stacked(q, kf, vf, None, None,
                                          jnp.int32(layer), lengths, starts,
                                          chunk=64)
    ref = xla_decode_attention(q, kf[layer], vf[layer], lengths, starts)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)

    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    out8 = pallas_decode_attention_stacked(q, k8, v8, ks, vs,
                                           jnp.int32(layer), lengths, starts,
                                           chunk=64)
    kd = k8[layer].astype(jnp.bfloat16) * ks[layer][..., None].astype(jnp.bfloat16)
    vd = v8[layer].astype(jnp.bfloat16) * vs[layer][..., None].astype(jnp.bfloat16)
    ref8 = xla_decode_attention(q, kd, vd, lengths, starts)
    np.testing.assert_allclose(np.asarray(out8, np.float32),
                               np.asarray(ref8, np.float32), atol=2e-2)


def test_stacked_rows_kernel_matches_xla_bf16_and_int8():
    """Row-batched stacked kernel (grid (B,), all kv heads per DMA, one
    block-diagonal dot for all query heads) must match the einsum path."""
    from fish_speech_tpu.ops.attention import (
        pallas_decode_attention_stacked_rows,
    )

    rng = np.random.default_rng(5)
    L, b, hkv, g, d, s = 3, 4, 8, 4, 32, 256
    layer = 2
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.bfloat16)
    lengths = jnp.asarray([100, 256, 37, 130], jnp.int32)
    starts = jnp.asarray([0, 30, 5, 0], jnp.int32)

    kf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    out = pallas_decode_attention_stacked_rows(
        q, kf, vf, None, None, jnp.int32(layer), lengths, starts, chunk=64)
    ref = xla_decode_attention(q, kf[layer], vf[layer], lengths, starts)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)

    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    out8 = pallas_decode_attention_stacked_rows(
        q, k8, v8, ks, vs, jnp.int32(layer), lengths, starts, chunk=64)
    kd = k8[layer].astype(jnp.bfloat16) * ks[layer][..., None].astype(jnp.bfloat16)
    vd = v8[layer].astype(jnp.bfloat16) * vs[layer][..., None].astype(jnp.bfloat16)
    ref8 = xla_decode_attention(q, kd, vd, lengths, starts)
    np.testing.assert_allclose(np.asarray(out8, np.float32),
                               np.asarray(ref8, np.float32), atol=2e-2)


def test_chunked_kernel_matches_xla():
    """Length-aware chunked kernel (double-buffered DMA, online softmax)."""
    from fish_speech_tpu.ops.attention import pallas_decode_attention_chunked

    rng = np.random.default_rng(1)
    b, hkv, g, d, s = 3, 2, 4, 32, 256
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    lengths = jnp.asarray([10, 256, 100], jnp.int32)
    starts = jnp.asarray([0, 65, 2], jnp.int32)

    a = xla_decode_attention(q, k, v, lengths, starts)
    c = pallas_decode_attention_chunked(q, k, v, lengths, starts, chunk=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_bucketed_prefix_attention_matches_full():
    """S=256 activates the 128-slot prefix lax.switch; S=250 (non-multiple)
    runs the full-cache einsum. Greedy streams must be identical (dropping
    fully-masked suffix positions is exact: exp(-1e30 - m) == 0 in f32)."""
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from ref_harness import random_lm_prompt

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(2), cfg)
    prompt = random_lm_prompt(cfg, 13, np.random.default_rng(7))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(cache_len):
        codes, _ = generate(
            params, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=8, im_end_id=4, greedy=True, cache_len=cache_len)
        return np.asarray(codes)

    np.testing.assert_array_equal(run(256), run(250))


def test_blocks_kernel_matches_xla_bf16_and_int8():
    """Block-of-rows stacked kernel (grid (B/rows,), shared chunk DMA per
    block, per-row block-diagonal dots; int8_scores quantizes q in-kernel)."""
    from fish_speech_tpu.ops.attention import pallas_decode_attention_blocks

    rng = np.random.default_rng(9)
    L, b, hkv, g, d, s = 3, 4, 8, 4, 32, 256
    layer = 1
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.bfloat16)
    lengths = jnp.asarray([100, 256, 37, 130], jnp.int32)
    starts = jnp.asarray([0, 30, 5, 0], jnp.int32)

    kf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    out = pallas_decode_attention_blocks(
        q, kf, vf, None, None, jnp.int32(layer), lengths, starts,
        rows=2, chunk=64)
    ref = xla_decode_attention(q, kf[layer], vf[layer], lengths, starts)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)

    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    kd = k8[layer].astype(jnp.bfloat16) * ks[layer][..., None].astype(jnp.bfloat16)
    vd = v8[layer].astype(jnp.bfloat16) * vs[layer][..., None].astype(jnp.bfloat16)
    ref8 = xla_decode_attention(q, kd, vd, lengths, starts)

    out8 = pallas_decode_attention_blocks(
        q, k8, v8, ks, vs, jnp.int32(layer), lengths, starts,
        rows=2, chunk=64, int8_scores=False)
    np.testing.assert_allclose(np.asarray(out8, np.float32),
                               np.asarray(ref8, np.float32), atol=2e-2)

    # int8 MXU scores: q quantized per (row, head) -> looser tolerance
    outq = pallas_decode_attention_blocks(
        q, k8, v8, ks, vs, jnp.int32(layer), lengths, starts,
        rows=2, chunk=64, int8_scores=True)
    np.testing.assert_allclose(np.asarray(outq, np.float32),
                               np.asarray(ref8, np.float32), atol=6e-2)


def test_stream_kernel_matches_xla_bf16_and_int8():
    """Streaming kernel: one grid step, flat (cell, chunk) cursor with
    cross-block DMA pipelining; must match the einsum path."""
    from fish_speech_tpu.ops.attention import pallas_decode_attention_stream

    rng = np.random.default_rng(11)
    L, b, hkv, g, d, s = 3, 8, 8, 4, 32, 256
    layer = 1
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.bfloat16)
    lengths = jnp.asarray([100, 256, 37, 130, 64, 200, 5, 256], jnp.int32)
    starts = jnp.asarray([0, 30, 5, 0, 0, 64, 0, 128], jnp.int32)

    kf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    out = pallas_decode_attention_stream(
        q, kf, vf, None, None, jnp.int32(layer), lengths, starts,
        rows=2, chunk=64)
    ref = xla_decode_attention(q, kf[layer], vf[layer], lengths, starts)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)

    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    out8 = pallas_decode_attention_stream(
        q, k8, v8, ks, vs, jnp.int32(layer), lengths, starts,
        rows=2, chunk=64)
    kd = k8[layer].astype(jnp.bfloat16) * ks[layer][..., None].astype(jnp.bfloat16)
    vd = v8[layer].astype(jnp.bfloat16) * vs[layer][..., None].astype(jnp.bfloat16)
    ref8 = xla_decode_attention(q, kd, vd, lengths, starts)
    np.testing.assert_allclose(np.asarray(out8, np.float32),
                               np.asarray(ref8, np.float32), atol=2e-2)


def test_stream_kernel_int8_scores():
    """int8-MXU score variant of the streaming kernel (q quantized once)."""
    from fish_speech_tpu.ops.attention import pallas_decode_attention_stream

    rng = np.random.default_rng(13)
    L, b, hkv, g, d, s = 2, 4, 8, 4, 32, 128
    layer = 0
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.bfloat16)
    lengths = jnp.asarray([100, 128, 37, 64], jnp.int32)
    starts = jnp.asarray([0, 30, 5, 0], jnp.int32)
    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    out = pallas_decode_attention_stream(
        q, k8, v8, ks, vs, jnp.int32(layer), lengths, starts,
        rows=2, chunk=64, int8_scores=True)
    kd = k8[layer].astype(jnp.bfloat16) * ks[layer][..., None].astype(jnp.bfloat16)
    vd = v8[layer].astype(jnp.bfloat16) * vs[layer][..., None].astype(jnp.bfloat16)
    ref = xla_decode_attention(q, kd, vd, lengths, starts)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=6e-2)


def test_stream_kernel_pos_major():
    """Position-major (L,S,B,Hkv,D) cache values; head-major scales."""
    from fish_speech_tpu.ops.attention import pallas_decode_attention_stream

    rng = np.random.default_rng(17)
    L, b, hkv, g, d, s = 2, 4, 8, 4, 32, 128
    layer = 1
    q = jnp.asarray(rng.standard_normal((b, hkv, g, d)), jnp.bfloat16)
    lengths = jnp.asarray([100, 128, 37, 64], jnp.int32)
    starts = jnp.asarray([0, 30, 5, 0], jnp.int32)
    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, hkv, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (L, b, hkv, s)), jnp.float32)
    kp = k8.transpose(0, 3, 1, 2, 4)  # (L, S, B, Hkv, D)
    vp = v8.transpose(0, 3, 1, 2, 4)
    # flat pos-major scales: [l, b, s*hkv + h]
    ksf = ks.transpose(0, 1, 3, 2).reshape(L, b, s * hkv)
    vsf = vs.transpose(0, 1, 3, 2).reshape(L, b, s * hkv)
    for i8 in (False, True):
        out = pallas_decode_attention_stream(
            q, kp, vp, ksf, vsf, jnp.int32(layer), lengths, starts,
            rows=2, chunk=64, int8_scores=i8, pos_major=True)
        kd = k8[layer].astype(jnp.bfloat16) * ks[layer][..., None].astype(jnp.bfloat16)
        vd = v8[layer].astype(jnp.bfloat16) * vs[layer][..., None].astype(jnp.bfloat16)
        ref = xla_decode_attention(q, kd, vd, lengths, starts)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=6e-2 if i8 else 2e-2)

    # bf16 cache (no scales)
    kf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.bfloat16)
    out = pallas_decode_attention_stream(
        q, kf.transpose(0, 3, 1, 2, 4), vf.transpose(0, 3, 1, 2, 4),
        None, None, jnp.int32(layer), lengths, starts,
        rows=2, chunk=64, pos_major=True)
    ref = xla_decode_attention(q, kf[layer], vf[layer], lengths, starts)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_pos_major_decode_matches_head_major():
    """kv_cache_layout='pos' (stream kernel + contiguous cache writes) must
    reproduce the head-major greedy stream through the whole decode."""
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from ref_harness import random_lm_prompt

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(5), cfg)
    prompt = random_lm_prompt(cfg, 9, np.random.default_rng(21))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(c):
        codes, _ = generate(
            params, c, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=5, im_end_id=4, greedy=True, cache_len=64)
        return np.asarray(codes)

    head = run(dataclasses.replace(cfg, use_pallas_attention=True,
                                   pallas_attn_block_rows=16,
                                   pallas_attn_stream=True,
                                   pallas_attn_int8_scores=False))
    pos = run(dataclasses.replace(cfg, use_pallas_attention=True,
                                  pallas_attn_block_rows=16,
                                  pallas_attn_stream=True,
                                  pallas_attn_int8_scores=False,
                                  kv_cache_layout="pos"))
    np.testing.assert_array_equal(head, pos)

    # int8 cache variant
    head8 = run(dataclasses.replace(cfg, use_pallas_attention=True,
                                    pallas_attn_block_rows=16,
                                    pallas_attn_stream=True,
                                    pallas_attn_int8_scores=False,
                                    kv_cache_dtype="int8"))
    pos8 = run(dataclasses.replace(cfg, use_pallas_attention=True,
                                   pallas_attn_block_rows=16,
                                   pallas_attn_stream=True,
                                   pallas_attn_int8_scores=False,
                                   kv_cache_dtype="int8",
                                   kv_cache_layout="pos"))
    np.testing.assert_array_equal(head8, pos8)


def test_stream_fold_matches_two_step():
    """KV-write-fold kernel (pallas_decode_attention_stream_fold) must be
    bit-exact vs quantize+DUS-then-stream. Measured 1.4% SLOWER than the
    two-step form at the 4B serving shape (the XLA write ops overlap well;
    the kernel's serialized row-write wait does not) — kept flag-gated
    (kv_fold_write / BENCH_KV_FOLD=1) as a documented refutation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fish_speech_tpu.ops.attention import (
        pallas_decode_attention_stream,
        pallas_decode_attention_stream_fold,
    )

    L, S, B, HKV, G, D = 2, 64, 8, 2, 2, 128
    key = jax.random.key(0)
    pos, li = 33, 1
    kf = jax.random.normal(jax.random.fold_in(key, 1), (L, S, B, HKV, D))
    vf = jax.random.normal(jax.random.fold_in(key, 2), (L, S, B, HKV, D))
    ksc = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1) / 127.0, 1e-8)
    vsc = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1) / 127.0, 1e-8)
    k8 = jnp.round(kf / ksc[..., None]).astype(jnp.int8)
    v8 = jnp.round(vf / vsc[..., None]).astype(jnp.int8)
    ks_flat = ksc.transpose(0, 2, 1, 3).reshape(L, B, S * HKV)
    vs_flat = vsc.transpose(0, 2, 1, 3).reshape(L, B, S * HKV)
    mask = (jnp.arange(S) < pos)[None, :, None, None, None]
    k8 = jnp.where(mask, k8, 0)
    v8 = jnp.where(mask, v8, 0)
    q = jax.random.normal(jax.random.fold_in(key, 3), (B, HKV, G, D),
                          jnp.bfloat16)
    nk = jax.random.normal(jax.random.fold_in(key, 4), (B, HKV, D),
                           jnp.bfloat16)
    nv = jax.random.normal(jax.random.fold_in(key, 5), (B, HKV, D),
                           jnp.bfloat16)
    lengths = jnp.full((B,), pos + 1, jnp.int32)
    starts = jnp.concatenate([jnp.zeros((B // 2,), jnp.int32),
                              jnp.full((B // 2,), 5, jnp.int32)])

    nkf, nvf = nk.astype(jnp.float32), nv.astype(jnp.float32)
    nks = jnp.maximum(jnp.max(jnp.abs(nkf), axis=-1) / 127.0, 1e-8)
    nvs = jnp.maximum(jnp.max(jnp.abs(nvf), axis=-1) / 127.0, 1e-8)
    k8a = jax.lax.dynamic_update_slice(
        k8, jnp.round(nkf / nks[..., None]).astype(jnp.int8)[None, None],
        (li, pos, 0, 0, 0))
    v8a = jax.lax.dynamic_update_slice(
        v8, jnp.round(nvf / nvs[..., None]).astype(jnp.int8)[None, None],
        (li, pos, 0, 0, 0))
    ksa = jax.lax.dynamic_update_slice(ks_flat, nks[None],
                                       (li, 0, pos * HKV))
    vsa = jax.lax.dynamic_update_slice(vs_flat, nvs[None],
                                       (li, 0, pos * HKV))
    oa = pallas_decode_attention_stream(q, k8a, v8a, ksa, vsa, li, lengths,
                                        starts, rows=4, chunk=32,
                                        int8_scores=True, pos_major=True)

    ob, kb, vb, nks_b, nvs_b = pallas_decode_attention_stream_fold(
        q, k8, v8, ks_flat, vs_flat, li, lengths, starts, nk, nv, pos,
        rows=4, chunk=32, int8_scores=True)
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
    np.testing.assert_array_equal(np.asarray(k8a), np.asarray(kb))
    np.testing.assert_array_equal(np.asarray(v8a), np.asarray(vb))
    np.testing.assert_allclose(np.asarray(nks), np.asarray(nks_b),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nvs), np.asarray(nvs_b),
                               rtol=1e-6)


def test_kv_fold_write_decode_matches():
    """cfg.kv_fold_write=True must reproduce the standard serving decode
    logits exactly (same quantize math, same attention) at a tiny shape."""
    import dataclasses
    import sys
    from pathlib import Path

    import jax
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from quant_drift import make_teacher_forced_inputs, run_teacher_forced

    from fish_speech_tpu.models.config import (
        apply_pallas_attn_mode,
        tiny_dual_ar_config,
    )
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.quant import quantize_lm_params

    base = dataclasses.replace(
        tiny_dual_ar_config(), w8a8_matmuls=True, kv_cache_dtype="int8",
        kv_cache_layout="pos")
    base = apply_pallas_attn_mode(base, "stream4", chunk=16)
    params = jax.jit(quantize_lm_params)(
        init_dual_ar_params(jax.random.key(0), base))
    prompt, forced = make_teacher_forced_inputs(base, 2, 8, 3)
    ref = run_teacher_forced(base, params, prompt, forced, 64, fused=False)
    cfg_fold = dataclasses.replace(base, kv_fold_write=True)
    got = run_teacher_forced(cfg_fold, params, prompt, forced, 64,
                             fused=False)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
