"""Int8 weight-only quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.decode import SamplingConfig, generate
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.ops.quant import as_weight, quantize_lm_params, quantize_weight
from fish_speech_tpu.ops.sampling import semantic_logit_bias

from ref_harness import random_lm_prompt


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.key(0), (64, 128)) * 0.05
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8
    back = as_weight(q, jnp.float32)
    err = float(jnp.max(jnp.abs(back - w)))
    # per-channel int8: max error <= scale/2 = max|w| / 254
    assert err <= float(jnp.max(jnp.abs(w))) / 254 + 1e-6


def test_quantized_decode_runs_and_tracks_fp():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    qparams = quantize_lm_params(params)

    prompt = random_lm_prompt(cfg, 12, np.random.default_rng(0))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(p):
        codes, _ = generate(
            p, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=6, im_end_id=4, greedy=True)
        return np.asarray(codes)

    fp = run(params)
    q = run(qparams)
    assert q.shape == fp.shape
    # int8 on a random tiny model won't match exactly, but the first greedy
    # token (largest margin) should usually agree; require the program runs
    # and emits in-range codes
    assert (q[:, 1:] >= 0).all() and (q[:, 1:] < cfg.codebook_size).all()


def test_quantized_checkpoint_roundtrip(tmp_path):
    from fish_speech_tpu.utils.checkpoint import load_params, save_params

    cfg = tiny_dual_ar_config()
    params = quantize_lm_params(init_dual_ar_params(jax.random.key(0), cfg))
    save_params(tmp_path / "q", params, cfg)
    loaded, _ = load_params(tmp_path / "q")
    assert loaded["layers"]["attention"]["wqkv"]["q"].dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["attention"]["wqkv"]["q"]),
        np.asarray(loaded["layers"]["attention"]["wqkv"]["q"]))


def test_int4_groupwise_roundtrip_and_decode():
    from fish_speech_tpu.ops.quant import quantize_weight_int4

    w = jax.random.normal(jax.random.key(2), (32, 64)) * 0.05
    q = quantize_weight_int4(w, groupsize=16)
    assert str(q["q"].dtype) == "int4"
    back = as_weight(q, jnp.float32)
    assert back.shape == w.shape
    # groupwise int4: max error <= scale/2 within each group
    err = jnp.abs(back - w)
    scale_rep = jnp.repeat(q["gs"], 16, axis=-1)
    assert float(jnp.max(err - scale_rep / 2)) <= 1e-6

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    qparams = quantize_lm_params(params, mode="int4", groupsize=16)
    prompt = random_lm_prompt(cfg, 10, np.random.default_rng(1))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)
    codes, _ = generate(
        qparams, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
        jax.random.key(0), SamplingConfig.create(), bias,
        max_new_tokens=4, im_end_id=4, greedy=True, cache_len=64)
    out = np.asarray(codes)
    assert (out[:, 1:] >= 0).all() and (out[:, 1:] < cfg.codebook_size).all()


def test_int4_checkpoint_roundtrip(tmp_path):
    from fish_speech_tpu.utils.checkpoint import load_params, save_params

    cfg = tiny_dual_ar_config()
    params = quantize_lm_params(init_dual_ar_params(jax.random.key(0), cfg),
                                mode="int4", groupsize=16)
    save_params(tmp_path / "q4", params, cfg)
    loaded, _ = load_params(tmp_path / "q4")
    q = loaded["layers"]["attention"]["wqkv"]["q"]
    assert str(q.dtype) == "int4"
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["attention"]["wqkv"]["q"]).astype(np.int8),
        np.asarray(q).astype(np.int8))


def test_int8_kv_cache_decode_tracks_fp():
    """int8 KV cache decode must run and (on a tiny greedy model) produce the
    same first tokens as the bf16 cache — the first steps have tiny caches so
    quantization error is negligible."""
    import dataclasses

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    prompt = random_lm_prompt(cfg, 12, np.random.default_rng(7))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)

    def run(c):
        codes, _ = generate(
            params, c, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
            jax.random.key(0), SamplingConfig.create(), bias,
            max_new_tokens=6, im_end_id=4, greedy=True, cache_len=64)
        return np.asarray(codes)

    fp = run(cfg)
    q = run(dataclasses.replace(cfg, kv_cache_dtype="int8"))
    assert q.shape == fp.shape
    # main-token stream should agree for at least the first few columns
    assert (q[0, 0, :2] == fp[0, 0, :2]).all()
    assert (q[:, 1:] >= 0).all() and (q[:, 1:] < cfg.codebook_size).all()


def test_matmul_t_w8a8_close_to_dequant():
    """int8xint8 MXU form ~= weight-only dequant form (both quantize the
    weight identically; w8a8 adds per-row activation quantization, so the
    tolerance is the activation-quant error bound)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fish_speech_tpu.ops.quant import matmul_t, quantize_weight

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32)
    qw = jax.jit(quantize_weight)(w)
    ref = matmul_t(x, qw, w8a8=False)
    out = matmul_t(x, qw, w8a8=True)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).max()
    assert err.max() / scale < 0.02, err.max() / scale


def test_decode_runs_with_w8a8():
    """Full decode program compiles and runs with w8a8 matmuls + quantized
    params; output codes stay in the valid semantic/codebook ranges."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, generate
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias
    from ref_harness import random_lm_prompt

    cfg = dataclasses.replace(tiny_dual_ar_config(), w8a8_matmuls=True)
    params = init_dual_ar_params(jax.random.key(0), cfg)
    params = jax.jit(quantize_lm_params)(params)
    prompt = random_lm_prompt(cfg, 9, np.random.default_rng(1))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)
    codes, lengths = generate(
        params, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
        jax.random.key(1), SamplingConfig.create(), bias,
        max_new_tokens=6, im_end_id=4, cache_len=64)
    codes = np.asarray(codes)
    main = codes[0, 0]
    ok = ((main >= cfg.semantic_begin_id) & (main <= cfg.semantic_end_id)) | (
        main == 4)
    assert ok.all(), main
    assert (codes[0, 1:] >= 0).all() and (codes[0, 1:] < cfg.codebook_size).all()


def test_w8a8_logits_close_and_topk_stable():
    """Bound the W8A8 accuracy trade at the model level: teacher-forced
    logits of a quantized tiny model in W8A8 vs weight-only-dequant mode
    must agree on top-1 for the vast majority of positions and stay close
    in value relative to the logit scale."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.dual_ar import forward_train
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from ref_harness import random_lm_prompt

    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(5), cfg)
    qparams = jax.jit(quantize_lm_params)(params)
    prompt = np.stack([random_lm_prompt(cfg, 24, np.random.default_rng(s))
                       for s in range(4)])  # (4, K+1, 24)

    def logits(c):
        out = forward_train(qparams, c, jnp.asarray(prompt), remat=False)
        return (np.asarray(out.token_logits, np.float32),
                np.asarray(out.codebook_logits, np.float32))

    tok_ref, cb_ref = logits(cfg)
    tok_w8, cb_w8 = logits(dataclasses.replace(cfg, w8a8_matmuls=True))

    for ref, got in ((tok_ref, tok_w8), (cb_ref, cb_w8)):
        scale = np.abs(ref).max()
        mae = np.abs(ref - got).mean()
        assert mae / scale < 0.02, (mae, scale)
        top1_ref = ref.argmax(-1)
        top1_got = got.argmax(-1)
        agree = (top1_ref == top1_got).mean()
        assert agree > 0.9, agree


def test_matmul_t_w4a8_close_to_dequant():
    """W4A8 grouped MXU form ~= int4 weight-only dequant form (identical
    weight quantization; W4A8 adds per-row activation quantization, so the
    tolerance is the activation-quant error bound)."""
    from fish_speech_tpu.ops.quant import matmul_t, quantize_weight_int4

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32)
    qw = jax.jit(lambda w: quantize_weight_int4(w, groupsize=64))(w)
    ref = matmul_t(x, qw, w8a8=False)   # int4 dequant matmul
    out = matmul_t(x, qw, w8a8=True)    # W4A8 grouped int8 MXU path
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).max()
    assert err.max() / scale < 0.02, err.max() / scale
    # 3-D activations (B, T, D) take the same path
    x3 = jnp.asarray(rng.standard_normal((2, 8, 256)), jnp.bfloat16)
    ref3 = matmul_t(x3, qw, w8a8=False)
    out3 = matmul_t(x3, qw, w8a8=True)
    err3 = np.abs(np.asarray(out3, np.float32) - np.asarray(ref3, np.float32))
    assert err3.max() / scale < 0.02, err3.max() / scale

    # nibble-packed serving form: identical values to the native int4 form
    from fish_speech_tpu.ops.quant import (
        as_weight, quantize_weight_int4_packed, unpack_int4)

    qp = jax.jit(lambda w: quantize_weight_int4_packed(w, groupsize=64))(w)
    assert qp["q4"].dtype == jnp.int8 and qp["q4"].shape == (128, 128)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(qp["q4"])),
        np.asarray(qw["q"]).astype(np.int8))
    np.testing.assert_allclose(np.asarray(as_weight(qp, jnp.float32)),
                               np.asarray(as_weight(qw, jnp.float32)),
                               rtol=0, atol=0)
    outp = matmul_t(x, qp, w8a8=True)
    np.testing.assert_array_equal(np.asarray(outp), np.asarray(out))


def test_decode_runs_with_w4a8():
    """Full decode program compiles and runs with int4 slow-stack weights +
    w8a8 flag (the W4A8 serving config); codes stay in range and the
    logits drift vs int4 weight-only dequant stays bounded."""
    import dataclasses

    from fish_speech_tpu.models.dual_ar import forward_train

    cfg = dataclasses.replace(tiny_dual_ar_config(), w8a8_matmuls=True)
    params = init_dual_ar_params(jax.random.key(0), cfg)
    params = jax.jit(lambda p: quantize_lm_params(p, mode="w4a8",
                                                  groupsize=16))(params)
    # slow layers packed int4, fast layers int8 (fused-kernel compatible)
    assert "q4" in params["layers"]["attention"]["wqkv"]
    assert "s" in params["fast_layers"]["attention"]["wqkv"]

    prompt = random_lm_prompt(cfg, 9, np.random.default_rng(1))
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)
    codes, _ = generate(
        params, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
        jax.random.key(1), SamplingConfig.create(), bias,
        max_new_tokens=6, im_end_id=4, cache_len=64)
    codes = np.asarray(codes)
    assert (codes[0, 1:] >= 0).all() and (codes[0, 1:] < cfg.codebook_size).all()

    # model-level drift bound: W4A8 vs int4 weight-only dequant
    batch = np.stack([random_lm_prompt(cfg, 24, np.random.default_rng(s))
                      for s in range(4)])

    def logits(c):
        out = forward_train(params, c, jnp.asarray(batch), remat=False)
        return np.asarray(out.token_logits, np.float32)

    ref = logits(dataclasses.replace(cfg, w8a8_matmuls=False))
    got = logits(cfg)
    scale = np.abs(ref).max()
    assert np.abs(ref - got).mean() / scale < 0.02
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_w4a8_pallas_kernel_matches_xla():
    """The Pallas W4A8 kernel (in-VMEM nibble unpack + per-group int8 MXU
    dots) must be exact vs the XLA grouped formulation on identical int8
    activations — both compute the same integer dots and f32 rescale."""
    from fish_speech_tpu.ops.quant import quantize_weight_int4_packed, unpack_int4
    from fish_speech_tpu.ops.w4a8 import w4a8_matmul

    rng = np.random.default_rng(3)
    m, k, n, gsz = 64, 512, 1024, 128
    w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
    qw = jax.jit(lambda w: quantize_weight_int4_packed(w, groupsize=gsz))(w)
    x8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)

    got = np.asarray(w4a8_matmul(x8, qw["q4"], qw["gs"], gsz=gsz,
                                 n_tile=256))
    # reference: unpack + grouped int32 dots in plain XLA
    unp = np.asarray(unpack_int4(qw["q4"])).astype(np.int32)   # (N, K)
    xs = np.asarray(x8).astype(np.int32)
    gs = np.asarray(qw["gs"])
    want = np.zeros((m, n), np.float64)
    for g in range(k // gsz):
        sl = slice(g * gsz, (g + 1) * gsz)
        want += (xs[:, sl] @ unp[:, sl].T).astype(np.float64) * gs[None, :, g]
    # integer dots are exact; the f32 group-sum order differs from the
    # float64 reference accumulation
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-2,
                               atol=1e-3)

    # and through matmul_t on the bf16 activation path (XLA fallback off-TPU)
    from fish_speech_tpu.ops.quant import matmul_t
    x = jnp.asarray(rng.standard_normal((8, k)), jnp.bfloat16)
    ref = matmul_t(x, qw, w8a8=True)
    from fish_speech_tpu.ops.w4a8 import matmul_t_w4a8_pallas
    got2 = matmul_t_w4a8_pallas(x, qw)
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=1e-3)


def test_incremental_quantize_matches_whole_tree():
    """quantize_lm_params_incremental (per-leaf jitted, destructive) must
    produce exactly the same tree as the whole-tree quantize_lm_params for
    every mode."""
    from fish_speech_tpu.ops.quant import (
        as_weight,
        is_quantized,
        quantize_lm_params_incremental,
    )

    cfg = tiny_dual_ar_config()
    for mode in ("int8", "w4a8"):
        params = init_dual_ar_params(jax.random.key(3), cfg)
        want = quantize_lm_params(params, mode=mode, groupsize=16)
        params2 = init_dual_ar_params(jax.random.key(3), cfg)
        got = quantize_lm_params_incremental(params2, mode=mode, groupsize=16)
        assert params2 == {}  # documented destructive contract
        assert jax.tree_util.tree_structure(want) == \
            jax.tree_util.tree_structure(got)

        # jit-vs-eager last-ulp scale differences can flip boundary quanta,
        # so compare the DEQUANTIZED values within one quantization step
        def leaves(tree):
            return jax.tree_util.tree_leaves(
                tree, is_leaf=lambda x: is_quantized(x))

        for a, b in zip(leaves(want), leaves(got)):
            if is_quantized(a):
                da = np.asarray(as_weight(a, jnp.float32))
                db = np.asarray(as_weight(b, jnp.float32))
                step = float(np.asarray(
                    a.get("s", a.get("gs"))).max())
                np.testing.assert_allclose(da, db, atol=1.01 * step)
            else:
                assert a.dtype == b.dtype
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_w4a8_checkpoint_roundtrip(tmp_path):
    """The packed serving form ('q4' int8 leaves) survives save/load in
    the native checkpoint layout (tools/quantize.py --mode w4a8)."""
    from fish_speech_tpu.utils.checkpoint import load_params, save_params

    cfg = tiny_dual_ar_config()
    params = quantize_lm_params(init_dual_ar_params(jax.random.key(0), cfg),
                                mode="w4a8", groupsize=16)
    save_params(tmp_path / "w4a8", params, cfg)
    loaded, _ = load_params(tmp_path / "w4a8")
    leaf = loaded["layers"]["attention"]["wqkv"]
    assert "q4" in leaf and leaf["q4"].dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["attention"]["wqkv"]["q4"]),
        np.asarray(leaf["q4"]))
    np.testing.assert_allclose(
        np.asarray(params["layers"]["attention"]["wqkv"]["gs"]),
        np.asarray(leaf["gs"]))


def test_w4a8_pc_kernel_close_to_grouped():
    """The per-channel-rescale W4A8 kernel (kept for re-testing on future
    hardware; retired as the serving route, QUANT_DRIFT.md r5) must agree
    with the grouped kernel to within its int8 re-quantization step."""
    from fish_speech_tpu.ops.quant import quantize_weight_int4_packed
    from fish_speech_tpu.ops.w4a8 import w4a8_matmul, w4a8_matmul_pc

    rng = np.random.default_rng(4)
    m, k, n, gsz = 32, 512, 512, 128
    w = jnp.asarray(rng.standard_normal((n, k)) * 0.05, jnp.float32)
    qw = jax.jit(lambda w: quantize_weight_int4_packed(w, groupsize=gsz))(w)
    x8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)

    base = np.asarray(w4a8_matmul(x8, qw["q4"], qw["gs"], gsz=gsz,
                                  n_tile=256)).astype(np.float64)
    got = np.asarray(w4a8_matmul_pc(x8, qw["q4"], qw["gs"], gsz=gsz,
                                    n_tile=256)).astype(np.float64)
    # pc re-quantizes the int4 reconstruction to per-channel int8: bound
    # the divergence by the per-channel quantization step x sum |x8|
    gs = np.asarray(qw["gs"]).astype(np.float64)
    s8 = gs.max(-1) * (8.0 / 127.0)
    bound = (np.abs(np.asarray(x8).astype(np.float64)).sum(-1)[:, None]
             * s8[None, :])
    assert np.all(np.abs(got - base) <= 0.75 * bound + 1e-6)
    # and it must be a close approximation in relative terms
    denom = np.abs(base).max()
    assert np.abs(got - base).max() / denom < 0.08
