"""Capture a jax.profiler trace of the 4B decode step and print an op-level
time breakdown (what the 2.2x gap above the HBM bandwidth floor is spent on).

Usage:
  python tools/profile_decode.py [--batch 64] [--cache 384] [--steps 32]
                                 [--quant] [--kv-int8] [--logdir /tmp/jaxtrace]

Prints the top self-time ops from the device plane of the captured xplane.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def run_workload(args):
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from fish_speech_tpu.models.config import s2_pro_lm_config
    from fish_speech_tpu.models.decode import SamplingConfig, decode_one_token
    from fish_speech_tpu.models.dual_ar import KVCache, precompute_freqs_cis
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.ops.sampling import RAS_WIN_SIZE, semantic_logit_bias

    cfg = s2_pro_lm_config(max_seq_len=2048)
    key = jax.random.key(0)
    params = init_dual_ar_params(key, cfg, dtype=jnp.bfloat16)
    if args.quant:
        from fish_speech_tpu.ops.quant import quantize_lm_params

        params = jax.jit(quantize_lm_params)(params)
    kv_dtype = jnp.int8 if args.kv_int8 else jnp.bfloat16
    cache = KVCache.create(cfg.n_layer, args.batch, args.cache,
                           cfg.n_local_heads, cfg.head_dim, dtype=kv_dtype,
                           pos_major=args.kv_layout == "pos")
    freqs = precompute_freqs_cis(args.cache, cfg.head_dim, cfg.rope_base)
    fast_freqs = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                      cfg.rope_base)
    sem_begin = cfg.vocab_size - cfg.codebook_size - 8
    sem_end = cfg.vocab_size - 8 - 1
    bias = semantic_logit_bias(cfg.vocab_size, sem_begin, sem_end, 5)
    cfg = dataclasses.replace(
        cfg, semantic_begin_id=sem_begin, semantic_end_id=sem_end,
        kv_cache_dtype="int8" if args.kv_int8 else "native",
        w8a8_matmuls=args.w8a8)
    from fish_speech_tpu.models.config import apply_pallas_attn_mode
    cfg = apply_pallas_attn_mode(cfg, args.pallas, chunk=args.pallas_chunk)
    if args.kv_layout != "head":
        cfg = dataclasses.replace(cfg, kv_cache_layout=args.kv_layout)
    if args.fused_fast:
        from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head

        params = enable_fused_fast_head(params)
    sampling = SamplingConfig.create()
    prev_win = jnp.zeros((args.batch, RAS_WIN_SIZE), jnp.int32)

    @partial(jax.jit, donate_argnums=(1,))
    def run_chunk(params, cache, cur, pos, key):
        def body(i, carry):
            cache, cur, key = carry
            key, sub = jax.random.split(key)
            col, new_cache = decode_one_token(
                params, cfg, cur, cache, pos + i, freqs, fast_freqs, bias,
                sub, sampling, prev_win, top_k=30, greedy=False,
                sample_support=(sem_begin, sem_end, 5))
            return new_cache, col[:, :, None], key

        cache, cur, key = jax.lax.fori_loop(0, args.steps, body,
                                            (cache, cur, key))
        return cache, cur

    cur = jnp.zeros((args.batch, cfg.num_codebooks + 1, 1), jnp.int32)
    pos = jnp.int32(128)

    # compile outside the trace
    t0 = time.perf_counter()
    cache, cur = run_chunk(params, cache, cur, pos, key)
    jax.block_until_ready(cur)
    print(f"# warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    with jax.profiler.trace(args.logdir):
        cache, cur = run_chunk(params, cache, cur, pos + args.steps, key)
        jax.block_until_ready(cur)


def summarize(logdir, top=40):
    """Parse the xplane protobuf and print per-op self time on the device."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane captured", file=sys.stderr)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            # XLA op lines carry per-op events; self time ≈ event duration on
            # the bottom-most line (XLA Ops); use the line named "XLA Ops"
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                pass
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                if "XLA Ops" in line.name:
                    totals[name] += dur
                    counts[name] += 1
        if totals:
            print(f"\n== plane: {plane.name} ==")
            total = sum(totals.values())
            print(f"total op time: {total:.2f} ms")
            for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ms:9.3f} ms {counts[name]:6d}x  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cache", type=int, default=384)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--quant", action="store_true", default=True)
    ap.add_argument("--no-quant", dest="quant", action="store_false")
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--w8a8", action="store_true", default=True)
    ap.add_argument("--no-w8a8", dest="w8a8", action="store_false")
    ap.add_argument("--pallas", default="0",
                    help="0 | rows | blocks[N][-bf16] | stream[N] (same as BENCH_PALLAS)")
    ap.add_argument("--pallas-chunk", type=int, default=128)
    ap.add_argument("--fused-fast", action="store_true",
                    help="fused fast-head sweep kernel (needs --quant)")
    ap.add_argument("--kv-layout", choices=["head", "pos"], default="head")
    ap.add_argument("--logdir", default="/tmp/jaxtrace")
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()

    if not args.summarize_only:
        run_workload(args)
    summarize(args.logdir)


if __name__ == "__main__":
    main()
