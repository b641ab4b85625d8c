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
