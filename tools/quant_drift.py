"""Quantization-accuracy harness at the REAL 4B model shape (VERDICT r1 #8).

Random weights suffice for drift BOUNDS: quantization error is a property of
the weight/activation distributions and the arithmetic, not of what the
logits mean. Fixed seeds make the numbers reproducible run-to-run.

Measures, teacher-forced on the same token stream (so configurations are
compared step-for-step without AR divergence):
  1. prefill logits drift: bf16 vs int8 weight-only vs +W8A8 over the
     restricted sampling support (the logits that actually get sampled);
  2. cached-decode per-step logits drift over N forced steps for the full
     serving config (int8 + W8A8 + pos-major int8 KV + stream kernel +
     fused fast head) vs the bf16 einsum path — including fast-head
     codebook logits;
reporting max/mean |dlogit|, top-1 agreement, and top-1-in-bf16-top-5.

Run:  python tools/quant_drift.py [--layers N] [--steps N] [--batch B]
Outputs one JSON line per comparison; paste into QUANT_DRIFT.md.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("BENCH_PLATFORM"):  # CPU smoke (axon pin, see bench.py)
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def drift_stats(name: str, ref: np.ndarray, got: np.ndarray) -> dict:
    ref = ref.astype(np.float64).reshape(-1, ref.shape[-1])
    got = got.astype(np.float64).reshape(-1, got.shape[-1])
    d = np.abs(ref - got)
    top1_ref = ref.argmax(-1)
    top1_got = got.argmax(-1)
    top5_ref = np.argsort(ref, axis=-1)[:, -5:]
    in_top5 = np.mean([g in t5 for g, t5 in zip(top1_got, top5_ref)])
    out = {
        "compare": name,
        "max_abs_dlogit": round(float(d.max()), 4),
        "mean_abs_dlogit": round(float(d.mean()), 5),
        "top1_agree": round(float((top1_ref == top1_got).mean()), 4),
        "top1_in_ref_top5": round(float(in_top5), 4),
        "rows": int(ref.shape[0]),
    }
    print(json.dumps(out))
    return out


def make_teacher_forced_inputs(base, batch: int, prompt_len: int,
                               steps: int, seed: int = 0):
    """Fixed-seed semantic-range prompt + forced continuation columns."""
    sem_begin, sem_end = base.semantic_begin_id, base.semantic_end_id
    rng = np.random.default_rng(seed)
    prompt = np.concatenate([
        rng.integers(sem_begin, sem_end + 1, (batch, 1, prompt_len)),
        rng.integers(0, base.codebook_size,
                     (batch, base.num_codebooks, prompt_len)),
    ], axis=1).astype(np.int32)
    forced = np.concatenate([
        rng.integers(sem_begin, sem_end + 1, (batch, 1, steps)),
        rng.integers(0, base.codebook_size, (batch, base.num_codebooks,
                                             steps)),
    ], axis=1).astype(np.int32)
    return prompt, forced


def run_teacher_forced(cfg, params, prompt: np.ndarray, forced: np.ndarray,
                       cache_len: int, *, fused: bool,
                       support: tuple | None = None):
    """Teacher-forced prefill + N cached decode steps.
    Returns (prefill slow logits over support, per-step slow logits,
    per-step fast-head logits for codebook 1).

    All KV caches are created EAGERLY outside the jitted program: on the
    TPU backend, a zeros-init created inside jit and threaded through the
    carry-mode layer scan gets its zero fill elided, leaving
    uninitialized memory at unfilled slots — masked scores keep those
    columns out of the softmax, but prob(0) x NaN-garbage still poisons
    the attention output (verified: 3+ layer 4B bf16 prefill produced
    all-NaN hidden states with in-jit cache creation and is clean with
    eager creation)."""
    from fish_speech_tpu.models.dual_ar import (
        KVCache,
        forward_generate,
        forward_generate_fast,
        precompute_freqs_cis,
    )
    from fish_speech_tpu.ops.fast_fused import FusedFastCache

    if support is None:
        support = (cfg.semantic_begin_id, cfg.semantic_end_id, 5)
    b, _, t = prompt.shape
    s = cache_len
    freqs = precompute_freqs_cis(s, cfg.head_dim, cfg.rope_base)
    fast_freqs = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                      cfg.rope_base)
    prompt_d = jnp.asarray(prompt)
    forced_d = jnp.asarray(forced)
    kv_dtype = (jnp.int8 if cfg.kv_cache_dtype == "int8"
                else jnp.bfloat16)
    cache0 = KVCache.create(cfg.n_layer, b, s, cfg.n_local_heads,
                            cfg.head_dim, dtype=kv_dtype,
                            pos_major=cfg.kv_cache_layout == "pos")
    if fused:
        fc0 = FusedFastCache.create(cfg.n_fast_layer, cfg.num_codebooks,
                                    -(-b // 8) * 8, cfg.fast_dim)
    else:
        fc0 = KVCache.create(cfg.n_fast_layer, b, cfg.num_codebooks,
                             cfg.fast_n_local_heads, cfg.fast_head_dim,
                             dtype=kv_dtype)

    @jax.jit
    def go(params, prompt, forced, cache, fc0):
        out = forward_generate(params, cfg, prompt, cache, jnp.int32(0),
                               freqs, logit_support=support)
        prefill_logits = out.logits[:, -1].astype(jnp.float32)
        cache = out.cache

        def step(carry, col):
            cache, pos = carry
            o = forward_generate(params, cfg, col[:, :, None], cache,
                                 pos, freqs, logit_support=support)
            # fast head: prime with hidden, read codebook-1 logits.
            # fc0 is the eagerly-zeroed template (see docstring); steps
            # only ever write rows 0-1, so reusing it is exact.
            from fish_speech_tpu.ops.quant import take_rows

            if fused:
                _, fc = forward_generate_fast(
                    params, cfg, o.hidden[:, -1], fc0, 0, fast_freqs,
                    want_logits=False)
                emb = take_rows(params["fast_embeddings"], col[:, 1])
                fl, _ = forward_generate_fast(params, cfg, emb, fc, 1,
                                              fast_freqs)
            else:
                _, fc = forward_generate_fast(
                    params, cfg, o.hidden[:, -1], fc0, jnp.int32(0),
                    fast_freqs, want_logits=False)
                emb = take_rows(params["fast_embeddings"], col[:, 1])
                fl, _ = forward_generate_fast(params, cfg, emb, fc,
                                              jnp.int32(1), fast_freqs)
            return ((o.cache, pos + 1),
                    (o.logits[:, -1].astype(jnp.float32),
                     fl.astype(jnp.float32)))

        (_, _), (slow_l, fast_l) = jax.lax.scan(
            step, (cache, jnp.int32(t)), forced.transpose(2, 0, 1))
        return prefill_logits, slow_l, fast_l

    pre, slow_l, fast_l = go(params, prompt_d, forced_d, cache0, fc0)
    return (np.asarray(pre), np.asarray(slow_l), np.asarray(fast_l))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=0,
                    help="override n_layer (0 = full 36-layer 4B)")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=48)
    ap.add_argument("--cache-len", type=int, default=256)
    args = ap.parse_args()

    import dataclasses

    from fish_speech_tpu.models.config import (
        apply_pallas_attn_mode,
        s2_pro_lm_config,
    )
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head
    from fish_speech_tpu.ops.quant import quantize_lm_params

    base = s2_pro_lm_config(max_seq_len=max(args.cache_len, 256))
    if args.layers:
        base = dataclasses.replace(base, n_layer=args.layers,
                                   n_fast_layer=min(args.layers,
                                                    base.n_fast_layer))
    sem_begin = base.vocab_size - base.codebook_size - 8
    sem_end = base.vocab_size - 8 - 1
    base = base.with_semantic_range(sem_begin, sem_end)
    support = (sem_begin, sem_end, 5)

    b, t, s = args.batch, args.prompt_len, args.cache_len
    prompt, forced = make_teacher_forced_inputs(base, b, t, args.steps)

    def run_config(cfg, params, fused: bool):
        return run_teacher_forced(cfg, params, prompt, forced, s,
                                  fused=fused, support=support)

    print(f"# shape: layers={base.n_layer} dim={base.dim} "
          f"fast_layers={base.n_fast_layer} B={b} T={t} steps={args.steps}",
          file=sys.stderr)

    params_bf16 = init_dual_ar_params(jax.random.key(0), base,
                                      dtype=jnp.bfloat16)
    cfg_bf16 = base
    ref = run_config(cfg_bf16, params_bf16, fused=False)

    params_q = jax.jit(quantize_lm_params)(params_bf16)
    del params_bf16

    # int8 weight-only (the reference's own PTQ level, quantize.py:190)
    cfg_q = base
    got = run_config(cfg_q, params_q, fused=False)
    drift_stats("int8_weights/prefill", ref[0], got[0])
    drift_stats("int8_weights/decode_slow", ref[1], got[1])
    drift_stats("int8_weights/decode_fast", ref[2], got[2])

    # + W8A8 + int8 KV (serving defaults, still einsum attention)
    cfg_w = dataclasses.replace(base, w8a8_matmuls=True,
                                kv_cache_dtype="int8")
    got = run_config(cfg_w, params_q, fused=False)
    drift_stats("w8a8_int8kv/prefill", ref[0], got[0])
    drift_stats("w8a8_int8kv/decode_slow", ref[1], got[1])
    drift_stats("w8a8_int8kv/decode_fast", ref[2], got[2])

    # full serving config: + pos-major + stream kernel + fused fast head
    cfg_full = dataclasses.replace(
        base, w8a8_matmuls=True, kv_cache_dtype="int8",
        kv_cache_layout="pos", unroll_fast_sweeps=True)
    cfg_full = apply_pallas_attn_mode(cfg_full, "stream")
    params_f = enable_fused_fast_head(dict(params_q))
    got = run_config(cfg_full, params_f, fused=True)
    drift_stats("serving_full/prefill", ref[0], got[0])
    drift_stats("serving_full/decode_slow", ref[1], got[1])
    drift_stats("serving_full/decode_fast", ref[2], got[2])
    del params_f, params_q

    # W4A8: int4 groupwise slow stack (nibble-packed) + W8A8 grouped MXU
    # dots + int8 KV (flag-gated serving option; BENCH_QUANT=int4). Re-init
    # from the same seed (int4 must quantize from bf16, not from int8);
    # per-leaf incremental quantize — the whole-tree program OOMs at 4B.
    from fish_speech_tpu.ops.quant import quantize_lm_params_incremental

    params_q4 = quantize_lm_params_incremental(
        init_dual_ar_params(jax.random.key(0), base, dtype=jnp.bfloat16),
        mode="w4a8")
    got = run_config(cfg_w, params_q4, fused=False)
    drift_stats("w4a8_int8kv/prefill", ref[0], got[0])
    drift_stats("w4a8_int8kv/decode_slow", ref[1], got[1])
    drift_stats("w4a8_int8kv/decode_fast", ref[2], got[2])


if __name__ == "__main__":
    main()
