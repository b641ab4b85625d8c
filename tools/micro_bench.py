"""Micro-benchmark of the decode-step components on the current device.

Times (per step): slow stack forward, fast head (10 AR positions), sampling,
full decode_one_token. Used to target optimization work; not part of the
headline bench.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from fish_speech_tpu.models.config import s2_pro_lm_config
    from fish_speech_tpu.models.decode import SamplingConfig, decode_one_token
    from fish_speech_tpu.models.dual_ar import (
        KVCache, forward_generate, forward_generate_fast, precompute_freqs_cis)
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import sample_one, semantic_logit_bias

    cfg = s2_pro_lm_config(max_seq_len=1024)
    b, s = 16, 1024
    import dataclasses
    cfg = dataclasses.replace(cfg, semantic_begin_id=1000, semantic_end_id=5095)

    params = init_dual_ar_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    cache = KVCache.create(cfg.n_layer, b, s, cfg.n_local_heads, cfg.head_dim)
    fast_cache = KVCache.create(cfg.n_fast_layer, b, cfg.num_codebooks,
                                cfg.fast_n_local_heads, cfg.fast_head_dim)
    freqs = precompute_freqs_cis(s, cfg.head_dim, cfg.rope_base)
    ffreqs = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim, cfg.rope_base)
    bias = semantic_logit_bias(cfg.vocab_size, 1000, 5095, 5)
    sampling = SamplingConfig.create()

    cur = jnp.zeros((b, cfg.num_codebooks + 1, 1), jnp.int32)
    pos = jnp.int32(128)

    # 1. slow stack single token
    slow = jax.jit(lambda p, c: forward_generate(p, cfg, cur, c, pos, freqs))
    t = timeit(lambda: slow(params, cache))
    print(f"slow_stack+head: {t*1e3:8.2f} ms")

    # 2. one fast-head position
    hidden = jnp.zeros((b, cfg.fast_dim), jnp.bfloat16)
    fast1 = jax.jit(lambda p, fc: forward_generate_fast(p, cfg, hidden, fc,
                                                        jnp.int32(0), ffreqs))
    t1 = timeit(lambda: fast1(params, fast_cache))
    print(f"fast_head x1:    {t1*1e3:8.2f} ms   (x{cfg.num_codebooks} = "
          f"{t1*cfg.num_codebooks*1e3:.2f} ms)")

    # 3. sampling over full vocab
    logits = jnp.zeros((b, cfg.vocab_size), jnp.float32)
    samp = jax.jit(lambda k, lg: sample_one(k, lg, jnp.float32(0.7),
                                            jnp.float32(0.7), 30))
    t2 = timeit(lambda: samp(jax.random.key(0), logits))
    print(f"sample(vocab):   {t2*1e3:8.2f} ms")

    logits_f = jnp.zeros((b, cfg.codebook_size), jnp.float32)
    t3 = timeit(lambda: samp(jax.random.key(0), logits_f))
    print(f"sample(codebook):{t3*1e3:8.2f} ms")

    # 4. full decode step
    full = jax.jit(lambda p, c, k: decode_one_token(
        p, cfg, cur, c, pos, freqs, ffreqs, bias, k, sampling,
        jnp.zeros((b, 10), jnp.int32), top_k=30, greedy=False))
    t4 = timeit(lambda: full(params, cache, jax.random.key(0)))
    print(f"full step:       {t4*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
