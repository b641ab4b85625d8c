"""Headline benchmark: batched S2-Pro-scale (4B) Dual-AR decode throughput on
one chip, reported as audio-seconds of speech generated per wall-clock second.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N,
   "unit": "audio_s/s/chip", "vs_baseline": N}

Baseline: the reference serves the same 4B model at RTF 0.195 on one H200 via
SGLang (reference README.md:134-137) = 1/0.195 ≈ 5.13 audio-seconds/second.
`vs_baseline` is our value divided by that. Acoustic frame rate is 44100/2048
≈ 21.53 codes/s (reference modded_dac_vq.yaml + modded_dac.py:833,861), so
audio_s/s = decode_steps/s × batch / 21.53.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")

import jax
import jax.numpy as jnp

# BENCH_PLATFORM=cpu forces the CPU smoke path (the container pins
# JAX_PLATFORMS=axon at plugin-registration level, so the env var alone
# cannot override it)
if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

# persistent compilation cache: the 4B decode program takes minutes to build
# cold; cached, re-runs warm up in seconds
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

FRAME_RATE = 44100.0 / 2048.0          # ≈ 21.53 acoustic tokens/s
BASELINE_AUDIO_S_PER_S = 1.0 / 0.195   # reference RTF on 1x H200


def main():
    from fish_speech_tpu.models.config import s2_pro_lm_config
    from fish_speech_tpu.models.decode import SamplingConfig, decode_one_token
    from fish_speech_tpu.models.dual_ar import KVCache, precompute_freqs_cis
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import RAS_WIN_SIZE, semantic_logit_bias

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        # default = best verified serving config: int8 weights + W8A8 MXU
        # dots, position-major int8 KV cache, carry-mode layer stack,
        # streaming Pallas decode attention (int8 MXU scores), fused
        # fast-head sweeps, batch 256, cache 384 -> ~382 audio-s/s/chip on
        # v5e. BENCH_QUANT=0 / BENCH_W8A8=0 / BENCH_KV=bf16 /
        # BENCH_KV_LAYOUT=head / BENCH_PALLAS / BENCH_FUSED_FAST=0 /
        # BENCH_BATCH / BENCH_CACHE / BENCH_STACK / BENCH_FAST_UNROLL /
        # BENCH_FAST_SCAN_UNROLL override; see README for the measured
        # matrix.
        cfg = s2_pro_lm_config(max_seq_len=2048)
        batch = int(os.environ.get("BENCH_BATCH", "256"))
        cache_len = int(os.environ.get("BENCH_CACHE", "384"))
        warmup, iters = 1, 3
        steps_per_call = 32
    else:  # CPU smoke fallback
        from __graft_entry__ import _entry_config
        cfg = _entry_config()
        batch, cache_len, warmup, iters = 2, 256, 1, 2
        steps_per_call = 4

    key = jax.random.key(0)
    params = init_dual_ar_params(key, cfg, dtype=jnp.bfloat16)
    if os.environ.get("BENCH_QUANT", "1" if on_tpu else "0") == "1":
        from fish_speech_tpu.ops.quant import quantize_lm_params

        params = jax.jit(quantize_lm_params)(params)
        print("# int8 weight-only quantized", file=sys.stderr)
        if os.environ.get("BENCH_FUSED_FAST", "1" if on_tpu else "0") == "1":
            from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head

            params = enable_fused_fast_head(params)
            print("# fused fast-head sweeps", file=sys.stderr)
    kv_default = "int8" if on_tpu else "bf16"
    kv_dtype = jnp.bfloat16
    if os.environ.get("BENCH_KV", kv_default) == "int8":
        kv_dtype = jnp.int8
        print("# int8 KV cache", file=sys.stderr)
    pallas_mode = os.environ.get("BENCH_PALLAS", "stream" if on_tpu else "0")
    kv_layout = os.environ.get("BENCH_KV_LAYOUT", None)
    if kv_layout is None:
        # pos layout is only decodable by the streaming kernel; keep the
        # einsum baseline (BENCH_PALLAS=0) apples-to-apples on head-major
        # (pos + einsums is correct but pays a transposing per-layer copy)
        kv_layout = ("pos" if on_tpu and pallas_mode.startswith("stream")
                     else "head")
    elif kv_layout == "pos" and not pallas_mode.startswith("stream"):
        print("# WARNING: BENCH_KV_LAYOUT=pos without BENCH_PALLAS=stream "
              "runs the transposing einsum read every step (slow baseline)",
              file=sys.stderr)
    if kv_layout == "pos":
        print("# position-major KV cache", file=sys.stderr)
    cache = KVCache.create(cfg.n_layer, batch, cache_len, cfg.n_local_heads,
                           cfg.head_dim, dtype=kv_dtype,
                           pos_major=kv_layout == "pos")
    freqs = precompute_freqs_cis(cache_len, cfg.head_dim, cfg.rope_base)
    fast_freqs = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                      cfg.rope_base)
    im_end = 5
    sem_begin = cfg.vocab_size - cfg.codebook_size - 8
    sem_end = cfg.vocab_size - 8 - 1
    bias = semantic_logit_bias(cfg.vocab_size, sem_begin, sem_end, im_end)
    sampling = SamplingConfig.create(temperature=0.7, top_p=0.7)
    prev_win = jnp.zeros((batch, RAS_WIN_SIZE), jnp.int32)

    import dataclasses
    cfg = dataclasses.replace(
        cfg, semantic_begin_id=sem_begin, semantic_end_id=sem_end,
        decode_stack_mode=os.environ.get("BENCH_STACK", ""),
        scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        fast_scan_unroll=int(os.environ.get("BENCH_FAST_SCAN_UNROLL", "1")),
        w8a8_matmuls=os.environ.get("BENCH_W8A8",
                                    "1" if on_tpu else "0") == "1",
        unroll_fast_sweeps=os.environ.get("BENCH_FAST_UNROLL", "0") == "1",
        kv_cache_dtype="int8" if kv_dtype == jnp.int8 else "native",
        kv_cache_layout=kv_layout)
    # BENCH_PALLAS: 0 = einsums, 1/rows = per-row stacked kernel,
    # blocks[N][-bf16] = block-of-rows kernel (N rows/cell, default 16;
    # -bf16 keeps the score dot off the int8 MXU), stream[N] = single-grid-
    # step streaming variant (cross-block DMA pipelining)
    from fish_speech_tpu.models.config import apply_pallas_attn_mode
    cfg = apply_pallas_attn_mode(
        cfg, pallas_mode,
        chunk=int(os.environ.get("BENCH_PALLAS_CHUNK", "128")))
    if cfg.w8a8_matmuls:
        print("# w8a8 int8 MXU matmuls", file=sys.stderr)

    from functools import partial

    # Run steps_per_call decode steps inside ONE jitted program so the host
    # (and the axon tunnel) dispatches once per chunk, exactly like the
    # production while_loop in models/decode.py.
    from fish_speech_tpu.ops.sampling import push_window

    @partial(jax.jit, donate_argnums=(1,))
    def run_chunk(params, cache, cur, prev_win, pos, key):
        # the RAS window is carried and pushed every step, exactly like the
        # production body in models/decode.py:258-275
        def body(i, carry):
            cache, cur, prev_win, key = carry
            key, sub = jax.random.split(key)
            col, new_cache = decode_one_token(
                params, cfg, cur, cache, pos + i, freqs,
                fast_freqs, bias, sub, sampling, prev_win,
                top_k=30, greedy=False,
                sample_support=(sem_begin, sem_end, im_end))
            return (new_cache, col[:, :, None],
                    push_window(prev_win, col[:, 0]), key)

        cache, cur, prev_win, key = jax.lax.fori_loop(
            0, steps_per_call, body, (cache, cur, prev_win, key))
        return cache, cur, prev_win

    cur = jnp.zeros((batch, cfg.num_codebooks + 1, 1), jnp.int32)
    pos = jnp.int32(128)

    t_compile = time.perf_counter()
    for i in range(warmup):
        key, sub = jax.random.split(key)
        cache, cur, prev_win = run_chunk(params, cache, cur, prev_win, pos, sub)
        pos = pos + steps_per_call
    jax.block_until_ready(cur)
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        cache, cur, prev_win = run_chunk(params, cache, cur, prev_win, pos, sub)
        pos = pos + steps_per_call
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0

    steps_per_s = iters * steps_per_call / dt
    audio_s_per_s = steps_per_s * batch / FRAME_RATE
    result = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(audio_s_per_s, 3),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(audio_s_per_s / BASELINE_AUDIO_S_PER_S, 3),
    }
    print(json.dumps(result))
    print(f"# decode_steps/s={steps_per_s:.1f} batch={batch} "
          f"platform={jax.devices()[0].platform} warmup_s={compile_s:.1f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
