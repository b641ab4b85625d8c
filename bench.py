"""Headline benchmark: batched S2-Pro-scale (4B) END-TO-END TTS throughput on
one chip — LM decode AND vocoder — in audio-seconds of speech per wall-clock
second.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N,
   "unit": "audio_s/s/chip", "vs_baseline": N, ...parts...}

`value` is the end-to-end figure: 1 / (1/lm + 1/vocoder) — both stages share
the chip serially, so their occupancies add. The parts (lm_audio_s_per_s,
vocoder_audio_s_per_s) and a second LM cache-length row
(lm_audio_s_per_s_b128_s1024) are reported as extra keys. BENCH_FAST=1 skips
everything but the headline LM row (`value` then falls back to LM-only and
`note` says so).

Baseline: the reference serves the same 4B model at RTF 0.195 on one H200 via
SGLang (reference README.md:134-137) = 1/0.195 ≈ 5.13 audio-seconds/second —
an end-to-end TTS figure, so the comparison is apples-to-apples. Acoustic
frame rate is 44100/2048 ≈ 21.53 codes/s (reference modded_dac_vq.yaml +
modded_dac.py:833,861), so audio_s/s = decode_steps/s × batch / 21.53.
"""

from __future__ import annotations

import gc
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
# Apples-to-apples BATCHED baseline: the reference serves 3,000+ acoustic
# tokens/s at RTF < 0.5 on one H200 via SGLang (reference README.md:137)
# = 3000 / 21.53 ≈ 139.3 audio-seconds of speech per second per GPU.
BASELINE_AUDIO_S_PER_S = 3000.0 / FRAME_RATE
# Secondary: single-stream RTF 0.195 (README.md:134-135) = 5.13 audio-s/s.
BASELINE_SINGLE_STREAM = 1.0 / 0.195


def build_lm(on_tpu: bool):
    """(params, cfg, bias, sampling bits) for the serving fast config."""
    from fish_speech_tpu.models.config import (
        apply_pallas_attn_mode,
        s2_pro_lm_config,
    )
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import semantic_logit_bias

    if on_tpu:
        # default = best verified serving config: int8 weights + W8A8 MXU
        # dots, position-major int8 KV cache, carry-mode layer stack,
        # streaming Pallas decode attention (int8 MXU scores), fused
        # fast-head sweeps. BENCH_QUANT=0 / BENCH_W8A8=0 / BENCH_KV=bf16 /
        # BENCH_KV_LAYOUT=head / BENCH_PALLAS / BENCH_FUSED_FAST=0 /
        # BENCH_BATCH / BENCH_CACHE / BENCH_STACK / BENCH_FAST_UNROLL /
        # BENCH_FAST_SCAN_UNROLL override; see README for the matrix.
        cfg = s2_pro_lm_config(max_seq_len=2048)
    else:
        from __graft_entry__ import _entry_config

        cfg = _entry_config()

    key = jax.random.key(0)
    params = init_dual_ar_params(key, cfg, dtype=jnp.bfloat16)
    bq = os.environ.get("BENCH_QUANT", "1" if on_tpu else "0")
    if bq in ("1", "int8", "int4"):
        from fish_speech_tpu.ops.quant import quantize_lm_params

        if bq == "int4":
            # W4A8: int4 groupwise slow-stack weights, nibble-packed in int8
            # (half the int8 weight traffic; grouped int8 MXU dots under
            # BENCH_W8A8), fast stack stays int8 for the fused kernel.
            # Per-leaf jitted+donated quantize: the whole-tree program's
            # temps + arguments exceed HBM at 4B.
            from fish_speech_tpu.ops.quant import (
                quantize_lm_params_incremental,
            )

            gsz = int(os.environ.get("BENCH_W4A8_GSZ", "128"))
            params = quantize_lm_params_incremental(params, mode="w4a8",
                                                    groupsize=gsz)
            print(f"# int4 groupwise (gsz={gsz}) slow stack (W4A8, packed)"
                  " + int8 rest", file=sys.stderr)
        else:
            params = jax.jit(quantize_lm_params)(params)
            print("# int8 weight-only quantized", file=sys.stderr)
        if os.environ.get("BENCH_FUSED_FAST", "1" if on_tpu else "0") == "1":
            from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head

            params = enable_fused_fast_head(params)
            print("# fused fast-head sweeps", file=sys.stderr)
        # settle before the KV cache's multi-GB allocations: the eager
        # repack/quantize temps free asynchronously on the remote runtime,
        # and a big allocation racing those frees can latch an async
        # RESOURCE_EXHAUSTED that surfaces at an unrelated later fetch
        _ = jax.device_get(jax.tree_util.tree_leaves(params)[0].reshape(-1)[0])
        time.sleep(5 if on_tpu else 0)

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
        kv_layout = ("pos" if on_tpu and pallas_mode.startswith("stream")
                     else "head")
    elif kv_layout == "pos" and not pallas_mode.startswith("stream"):
        print("# WARNING: BENCH_KV_LAYOUT=pos without BENCH_PALLAS=stream "
              "runs the transposing einsum read every step (slow baseline)",
              file=sys.stderr)
    if kv_layout == "pos":
        print("# position-major KV cache", file=sys.stderr)

    im_end = 5
    sem_begin = cfg.vocab_size - cfg.codebook_size - 8
    sem_end = cfg.vocab_size - 8 - 1
    bias = semantic_logit_bias(cfg.vocab_size, sem_begin, sem_end, im_end)

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
        kv_cache_layout=kv_layout,
        kv_fold_write=os.environ.get("BENCH_KV_FOLD", "0") == "1")
    cfg = apply_pallas_attn_mode(
        cfg, pallas_mode,
        chunk=int(os.environ.get("BENCH_PALLAS_CHUNK", "128")))
    if cfg.w8a8_matmuls:
        print("# w8a8 int8 MXU matmuls", file=sys.stderr)
    return params, cfg, bias, kv_dtype, (sem_begin, sem_end, im_end)


def measure_lm(params, cfg, bias, kv_dtype, support, *, batch: int,
               cache_len: int, warmup: int, iters: int,
               steps_per_call: int) -> float:
    """Decode-loop throughput at (batch, cache_len) -> audio_s/s/chip."""
    from functools import partial

    from fish_speech_tpu.models.decode import SamplingConfig, decode_one_token
    from fish_speech_tpu.models.dual_ar import KVCache, precompute_freqs_cis
    from fish_speech_tpu.ops.sampling import RAS_WIN_SIZE, push_window

    sem_begin, sem_end, im_end = support
    cache = KVCache.create(cfg.n_layer, batch, cache_len, cfg.n_local_heads,
                           cfg.head_dim, dtype=kv_dtype,
                           pos_major=cfg.kv_cache_layout == "pos")
    freqs = precompute_freqs_cis(cache_len, cfg.head_dim, cfg.rope_base)
    fast_freqs = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                      cfg.rope_base)
    sampling = SamplingConfig.create(temperature=0.7, top_p=0.7)

    # Run steps_per_call decode steps inside ONE jitted program so the host
    # (and the axon tunnel) dispatches once per chunk; the RAS window is
    # carried and pushed every step, exactly like the production body in
    # models/decode.py:258-275.
    @partial(jax.jit, donate_argnums=(1,))
    def run_chunk(params, cache, cur, prev_win, pos, key):
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

    key = jax.random.key(1)
    cur = jnp.zeros((batch, cfg.num_codebooks + 1, 1), jnp.int32)
    prev_win = jnp.zeros((batch, RAS_WIN_SIZE), jnp.int32)
    pos = jnp.int32(128)
    assert 128 + (warmup + iters) * steps_per_call <= cache_len, (
        f"LM row would overrun the KV cache: 128 + "
        f"{warmup + iters}x{steps_per_call} > {cache_len}; raise "
        f"BENCH_CACHE or lower BENCH_STEPS")

    t_compile = time.perf_counter()
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        cache, cur, prev_win = run_chunk(params, cache, cur, prev_win, pos, sub)
        pos = pos + steps_per_call
    jax.block_until_ready(cur)
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        cache, cur, prev_win = run_chunk(params, cache, cur, prev_win, pos, sub)
        pos = pos + steps_per_call
    # host-fetch a value that depends on every dispatched step: on the
    # remote axon runtime block_until_ready can return before execution
    # finishes, but a host transfer cannot
    _ = int(jax.device_get(cur[0, 0, 0]))
    dt = time.perf_counter() - t0

    del cache
    gc.collect()
    steps_per_s = iters * steps_per_call / dt
    audio_s_per_s = steps_per_s * batch / FRAME_RATE
    print(f"# lm: B={batch} S={cache_len} decode_steps/s={steps_per_s:.1f} "
          f"audio_s/s={audio_s_per_s:.1f} warmup_s={compile_s:.1f}",
          file=sys.stderr)
    return audio_s_per_s, compile_s


_VOC_CACHE: dict = {}


def build_vocoder(on_tpu: bool):
    """(ccfg, bf16 params, impl name, decode_fn).

    BENCH_VOC_IMPL selects the decode path: "pallas" (fused kernels),
    "lax" (conv_general_dilated), "mm" (conv-as-matmul), or "auto"
    (default): time pallas and lax steady-state at warmup and keep the
    faster — a runtime dispatch pathology can then never regress the
    artifact below the plain-XLA path (round-3 lesson: the remote axon
    runtime charges a one-time ~40-50 s on the SECOND call of a
    many-custom-call program; with only one warmup call that cost landed
    in the timed loop and scored 6.5 audio-s/s for a kernel whose steady
    state is ~430). Init and packing run under jit: eager init through the
    remote TPU tunnel pays a per-op remote-compile round trip."""
    from fish_speech_tpu.codec import init_dac_params
    from fish_speech_tpu.codec.config import (
        s2_pro_codec_config,
        tiny_codec_config,
    )
    from fish_speech_tpu.codec.fastpath import (
        dac_from_indices_mm,
        dac_from_indices_pallas,
        pack_decoder,
    )
    from fish_speech_tpu.codec.model import dac_from_indices

    if "tuple" in _VOC_CACHE:
        return _VOC_CACHE["tuple"]

    ccfg = s2_pro_codec_config() if on_tpu else tiny_codec_config()
    cparams = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            init_dac_params(k, ccfg)))(jax.random.key(2))
    impl = os.environ.get("BENCH_VOC_IMPL", "auto" if on_tpu else "lax")

    def make(name):
        if name == "lax":
            return dac_from_indices
        if name == "mm":
            return dac_from_indices_mm
        packed = jax.jit(lambda p: pack_decoder(p["decoder"], ccfg))(cparams)
        return lambda p, cfg, codes: dac_from_indices_pallas(
            p, cfg, codes, packed=packed)

    _VOC_CACHE["make"] = make
    if impl == "auto":
        impl, _ = _pick_vocoder_impl(ccfg, cparams, make)
    print(f"# vocoder impl: {impl}", file=sys.stderr)
    _VOC_CACHE["tuple"] = (ccfg, cparams, impl, make(impl))
    return _VOC_CACHE["tuple"]


def _voc_fn(name: str, ccfg, make):
    """Jitted (params, codes, prev) -> (wav, scalar) bench program for one
    impl, cached so the probe and the timed row share ONE compiled program
    (a fresh lambda would recompile and re-pay the second-call cost)."""
    key = ("fn", name)
    if key not in _VOC_CACHE:
        decode = make(name)
        _VOC_CACHE[key] = jax.jit(lambda p, c, prev, d=decode: (
            lambda w: (w, jnp.max(jnp.abs(w))))(d(
                p, ccfg,
                (c + (prev > 2.0).astype(jnp.int32)[None, None, None])
                % ccfg.rvq.codebook_size)))
    return _VOC_CACHE[key]


def _pick_vocoder_impl(ccfg, cparams, make, *, bv: int = 8, tv: int = 128):
    """Steady-state probe over the candidate impls (shared policy in
    utils/probing.py: 2 synced warmup calls absorb compile + the remote
    runtime's one-time second-call cost, then 2 timed calls)."""
    from fish_speech_tpu.utils.probing import steady_state_winner

    n_q = ccfg.rvq.total_codebooks
    codes = jax.random.randint(jax.random.key(3), (bv, n_q, tv), 0,
                               ccfg.rvq.codebook_size, dtype=jnp.int32)

    def candidate(name):
        fn = _voc_fn(name, ccfg, make)
        prev = [jnp.float32(0)]

        def call():
            _, prev[0] = fn(cparams, codes, prev[0])
            _ = float(jax.device_get(prev[0]))
        return call

    return steady_state_winner(
        {name: candidate(name) for name in ("pallas", "lax")},
        on_result=lambda name, s: print(
            f"# vocoder impl probe: {name} steady={s:.3f} s/call",
            file=sys.stderr))


def measure_e2e(params, cfg, bias, kv_dtype, support, *, batch: int,
                cache_len: int, steps_per_call: int, voc_frames: int,
                warmup: int, iters: int) -> float | None:
    """MEASURED end-to-end throughput: interleave one LM decode chunk
    (batch x steps_per_call frames) with vocoding exactly that many frames,
    in one timed loop on the chip — real dispatch gaps and serial occupancy
    included (replaces the former 1/(1/lm+1/voc) arithmetic)."""
    from functools import partial

    from fish_speech_tpu.models.decode import SamplingConfig, decode_one_token
    from fish_speech_tpu.models.dual_ar import KVCache, precompute_freqs_cis
    from fish_speech_tpu.ops.sampling import RAS_WIN_SIZE, push_window

    on_tpu = jax.devices()[0].platform == "tpu"
    ccfg, cparams, voc_impl, dac_decode = build_vocoder(on_tpu)
    n_q = ccfg.rvq.total_codebooks
    frames_per_chunk = batch * steps_per_call
    tv = min(voc_frames, frames_per_chunk)
    bv = frames_per_chunk // tv
    assert bv * tv == frames_per_chunk, (batch, steps_per_call, tv)
    # cap the vocoder batch per dispatch so its activations fit beside the
    # LM KV cache at large LM batch; multiple voc calls per LM chunk.
    # n_voc must divide bv exactly — search up from the ceil split
    bv_cap = int(os.environ.get("BENCH_E2E_VOC_BATCH", "16"))
    n_voc = -(-bv // bv_cap)
    while bv % n_voc:
        n_voc += 1
    bv = bv // n_voc
    assert bv * tv * n_voc == frames_per_chunk, (bv, tv, n_voc)
    # the timed loop must fit inside the cache: pos starts at 128 and each
    # of the max(warmup,2)+iters chunks advances it steps_per_call rows
    # (silent dynamic_update_slice clamping would measure a corrupted
    # program, e.g. BENCH_STEPS=64 with the default 384 cache)
    n_chunks = max(warmup, 2) + iters
    assert 128 + n_chunks * steps_per_call <= cache_len, (
        f"e2e would overrun the KV cache: 128 + {n_chunks}x{steps_per_call} "
        f"> {cache_len}; raise BENCH_E2E_CACHE or lower BENCH_STEPS")

    sem_begin, sem_end, im_end = support
    cache = KVCache.create(cfg.n_layer, batch, cache_len, cfg.n_local_heads,
                           cfg.head_dim, dtype=kv_dtype,
                           pos_major=cfg.kv_cache_layout == "pos")
    freqs = precompute_freqs_cis(cache_len, cfg.head_dim, cfg.rope_base)
    fast_freqs = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                      cfg.rope_base)
    sampling = SamplingConfig.create(temperature=0.7, top_p=0.7)

    @partial(jax.jit, donate_argnums=(1,))
    def lm_chunk(params, cache, cur, prev_win, pos, key):
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

    voc_fn = jax.jit(lambda p, c, prev: (
        lambda w: jnp.max(jnp.abs(w)))(dac_decode(
            p, ccfg, (c + prev.astype(jnp.int32)[None, None, None])
            % ccfg.rvq.codebook_size)))

    key = jax.random.key(1)
    cur = jnp.zeros((batch, cfg.num_codebooks + 1, 1), jnp.int32)
    prev_win = jnp.zeros((batch, RAS_WIN_SIZE), jnp.int32)
    pos = jnp.int32(128)
    codes = jax.random.randint(jax.random.key(3), (bv, n_q, tv), 0,
                               ccfg.rvq.codebook_size, dtype=jnp.int32)

    def one_iter(cache, cur, prev_win, pos, key, vprev):
        key, sub = jax.random.split(key)
        cache, cur, prev_win = lm_chunk(params, cache, cur, prev_win,
                                        pos, sub)
        # vocoder input depends on the LM chunk's output column: the two
        # stages are serially chained exactly like serving
        for _ in range(n_voc):
            vprev = voc_fn(cparams, codes, vprev + cur[0, 0, 0])
        return cache, cur, prev_win, pos + steps_per_call, key, vprev

    # >=2 warmup calls, each host-synced: the remote runtime charges a
    # one-time cost on the SECOND call of a many-custom-call program
    # (round-3 regression); it must be absorbed here, not in the timed loop
    t_compile = time.perf_counter()
    vprev = jnp.int32(0)
    for _ in range(max(warmup, 2)):
        cache, cur, prev_win, pos, key, vprev = one_iter(
            cache, cur, prev_win, pos, key, vprev)
        _ = float(jax.device_get(vprev))
    compile_s = time.perf_counter() - t_compile

    # per-iteration host sync: see measure_vocoder (chained multi-program
    # dispatch is pathological on the remote runtime)
    t0 = time.perf_counter()
    for _ in range(iters):
        cache, cur, prev_win, pos, key, vprev = one_iter(
            cache, cur, prev_win, pos, key, vprev)
        _ = float(jax.device_get(vprev))
    dt = time.perf_counter() - t0

    del cache
    gc.collect()
    audio_s_per_s = iters * frames_per_chunk / FRAME_RATE / dt
    print(f"# e2e: B={batch} S={cache_len} voc={n_voc}x({bv}x{tv}) "
          f"impl={voc_impl} "
          f"audio_s/s={audio_s_per_s:.1f} warmup_s={compile_s:.1f}",
          file=sys.stderr)
    return audio_s_per_s, compile_s


def measure_vocoder(on_tpu: bool, *, warmup: int = 2, iters: int = 6) -> float:
    """Batched codes->waveform throughput (bf16 serving dtype) ->
    audio_s/s/chip. The measured program is `dac_from_indices` — the exact
    serving decode path (ref hot path modded_dac.py:760-801)."""
    if on_tpu:
        # default matches the e2e loop's dispatch shape (16x128) so the
        # standalone row measures the same program serving actually runs;
        # it also halves the per-dispatch tunnel-RTT share vs the old B=8
        bv = int(os.environ.get("BENCH_VOC_BATCH", "16"))
        tv = int(os.environ.get("BENCH_VOC_FRAMES", "128"))
    else:
        bv, tv = 2, 16

    ccfg, cparams, voc_impl, dac_decode = build_vocoder(on_tpu)
    n_q = ccfg.rvq.total_codebooks
    codes = jax.random.randint(jax.random.key(3), (bv, n_q, tv), 0,
                               ccfg.rvq.codebook_size, dtype=jnp.int32)
    # fold the previous call's output back into the next input (a data
    # dependency chains the iterations) and reduce to ONE host scalar: on
    # the remote axon runtime block_until_ready can return before the
    # execution finishes, but a host transfer cannot. The jitted program is
    # shared with the auto-select probe (same shape), so a probed impl
    # arrives here already warm.
    fn = _voc_fn(voc_impl, ccfg, _VOC_CACHE["make"])

    # >=2 synced warmup calls: absorb the remote runtime's one-time
    # second-call cost (round-3 regression) before timing
    t_compile = time.perf_counter()
    prev = jnp.float32(0)
    for _ in range(max(warmup, 2)):
        wav, prev = fn(cparams, codes, prev)
        _ = float(jax.device_get(prev))
    compile_s = time.perf_counter() - t_compile

    # host-sync EVERY call (the serving pattern: dispatch, fetch audio).
    # Chaining several of these multi-custom-call programs with one final
    # fetch trips a remote-runtime pathology (measured 0.11 s/call synced
    # vs ~13 s/call chained on the axon tunnel).
    t0 = time.perf_counter()
    for _ in range(iters):
        wav, prev = fn(cparams, codes, prev)
        _ = float(jax.device_get(prev))
    dt = time.perf_counter() - t0

    del cparams
    gc.collect()
    frames_per_s = iters * bv * tv / dt
    audio_s_per_s = frames_per_s / FRAME_RATE
    print(f"# vocoder: B={bv} T={tv} impl={voc_impl} "
          f"frames/s={frames_per_s:.0f} "
          f"audio_s/s={audio_s_per_s:.1f} warmup_s={compile_s:.1f}",
          file=sys.stderr)
    return audio_s_per_s, compile_s


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    fast = os.environ.get("BENCH_FAST", "0") == "1"
    if on_tpu:
        batch = int(os.environ.get("BENCH_BATCH", "256"))
        cache_len = int(os.environ.get("BENCH_CACHE", "384"))
        warmup, iters = 1, 3
        steps_per_call = int(os.environ.get("BENCH_STEPS", "32"))
    else:
        batch, cache_len, warmup, iters, steps_per_call = 2, 256, 1, 2, 4

    params, cfg, bias, kv_dtype, support = build_lm(on_tpu)
    lm, lm_warm_s = measure_lm(params, cfg, bias, kv_dtype, support,
                               batch=batch, cache_len=cache_len,
                               warmup=warmup, iters=iters,
                               steps_per_call=steps_per_call)

    extras = {}
    if not fast:
        # second cache-length row: realistic long-generation serving shape
        # (prompt + ~900 generated frames); batch scaled to fit HBM
        b2 = int(os.environ.get("BENCH_BATCH2", "128"))
        s2 = int(os.environ.get("BENCH_CACHE2", "1024"))
        if not on_tpu:
            b2, s2 = 2, 512
        try:
            extras[f"lm_audio_s_per_s_b{b2}_s{s2}"] = round(
                measure_lm(params, cfg, bias, kv_dtype, support, batch=b2,
                           cache_len=s2, warmup=warmup, iters=iters,
                           steps_per_call=steps_per_call)[0], 3)
        except Exception as e:  # keep the headline even if the row OOMs
            print(f"# lm row B={b2} S={s2} failed: {e}", file=sys.stderr)

    # vocoder-only row BEFORE the e2e row: the e2e config runs near the
    # HBM roof, and an async OOM on this runtime latches every subsequent
    # dispatch — ordered this way, a failed e2e still leaves the honest
    # 1/(1/lm + 1/voc) arithmetic fallback instead of an LM-only artifact
    voc = None
    if not fast:
        try:
            voc, voc_warm_s = measure_vocoder(on_tpu)
            extras["warmup_vocoder_s"] = round(voc_warm_s, 1)
        except Exception as e:
            print(f"# vocoder bench failed: {e}", file=sys.stderr)

    e2e = None
    if not fast:
        # measured combined run: LM decode chunk + vocoding the same number
        # of frames, serially chained on-chip (the serving occupancy
        # pattern). The vocoder batch per dispatch is capped
        # (BENCH_E2E_VOC_BATCH) so its activations fit beside the B=256
        # KV cache; 4 capped calls per LM chunk measured 225.8 audio-s/s
        # vs 191.5 at the old B=128 single-call shape.
        be = int(os.environ.get("BENCH_E2E_BATCH", "256"))
        se = int(os.environ.get("BENCH_E2E_CACHE", "384"))
        vf = int(os.environ.get("BENCH_E2E_VOC_FRAMES", "128"))
        if not on_tpu:
            be, se, vf = 2, 256, 4
        try:
            e2e, e2e_warm_s = measure_e2e(
                params, cfg, bias, kv_dtype, support, batch=be,
                cache_len=se, steps_per_call=steps_per_call,
                voc_frames=vf, warmup=warmup, iters=iters)
            extras["warmup_e2e_s"] = round(e2e_warm_s, 1)
        except Exception as e:
            print(f"# e2e bench failed: {e}", file=sys.stderr)

    del params
    gc.collect()

    if e2e is not None:
        value = e2e
        note = ("end-to-end MEASURED: interleaved LM decode + vocoder on "
                "one chip; vs_baseline is the reference's batched 139.3 "
                "audio_s/s (3000 tok/s, README.md:137) on one H200")
    elif voc is not None:
        value = 1.0 / (1.0 / lm + 1.0 / voc)
        note = "end-to-end: 1/(1/lm + 1/vocoder), serial chip occupancy"
    else:
        value = lm
        note = "LM-only (BENCH_FAST or vocoder row unavailable)"
    result = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 3),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
        "vs_single_stream_rtf": round(value / BASELINE_SINGLE_STREAM, 3),
        "lm_audio_s_per_s": round(lm, 3),
        "warmup_lm_s": round(lm_warm_s, 1),
        "note": note,
        **extras,
    }
    if voc is not None:
        result["vocoder_audio_s_per_s"] = round(voc, 3)
    if "tuple" in _VOC_CACHE:  # "make" alone = build_vocoder died mid-way
        result["vocoder_impl"] = _VOC_CACHE["tuple"][2]
    print(json.dumps(result))
    print(f"# platform={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
