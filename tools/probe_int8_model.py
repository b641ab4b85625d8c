"""Escalating int8-KV probes at the whole-model level (tiny config).

Usage: python tools/probe_int8_model.py <case>  (run under `timeout`)
  tiny_bf16   — control: tiny decode_one_token, bf16 cache
  tiny_int8   — tiny decode_one_token, int8 cache
  tiny_loop   — tiny model, 8-step fori_loop chunk (the bench program shape)
  tiny_scan   — same but layer stack scanned (production path)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def main(case):
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.decode import SamplingConfig, decode_one_token
    from fish_speech_tpu.models.dual_ar import KVCache, precompute_freqs_cis
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import RAS_WIN_SIZE, semantic_logit_bias

    cfg = tiny_dual_ar_config()
    B, S = 4, 128
    key = jax.random.key(0)
    params = init_dual_ar_params(key, cfg, dtype=jnp.bfloat16)
    dtype = jnp.bfloat16 if case.endswith("bf16") else jnp.int8
    cache = KVCache.create(cfg.n_layer, B, S, cfg.n_local_heads,
                           cfg.head_dim, dtype=dtype)
    freqs = precompute_freqs_cis(S, cfg.head_dim, cfg.rope_base)
    fast_freqs = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                      cfg.rope_base)
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, 4)
    sampling = SamplingConfig.create()
    prev_win = jnp.zeros((B, RAS_WIN_SIZE), jnp.int32)
    cur = jnp.zeros((B, cfg.num_codebooks + 1, 1), jnp.int32)
    pos = jnp.int32(16)

    if case in ("fg_bf16", "fg_int8"):
        # slow stack only: isolates attention/scan from sampling + fast head
        from fish_speech_tpu.models.dual_ar import forward_generate

        @jax.jit
        def f(params, cache, cur, pos, key):
            return forward_generate(params, cfg, cur, cache, pos, freqs)
    elif case in ("tiny_bf16", "tiny_int8"):
        @jax.jit
        def f(params, cache, cur, pos, key):
            return decode_one_token(params, cfg, cur, cache, pos, freqs,
                                    fast_freqs, bias, key, sampling, prev_win,
                                    top_k=30, greedy=False)
    else:
        from functools import partial

        @partial(jax.jit, donate_argnums=(1,))
        def f(params, cache, cur, pos, key):
            def body(i, carry):
                cache, cur, key = carry
                key, sub = jax.random.split(key)
                col, cache = decode_one_token(
                    params, cfg, cur, cache, pos + i, freqs, fast_freqs,
                    bias, sub, sampling, prev_win, top_k=30, greedy=False)
                return cache, col[:, :, None], key
            cache, cur, key = jax.lax.fori_loop(0, 8, body, (cache, cur, key))
            return cur, cache

    t0 = time.perf_counter()
    out = jax.block_until_ready(f(params, cache, cur, pos, key))
    print(f"OK {case}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
