"""Measure serving latency: time-to-first-audio (TTFA) and single-stream RTF
through the token-streaming path (scheduler + streaming vocoder).

The reference's headline latency is ~100 ms TTFA / RTF 0.195 on 1x H200 via
SGLang (reference README.md:134-137). This drives our equivalent surface:
TTSEngine.stream_tts with the continuous-batching scheduler.

Usage:
  python tools/latency_bench.py                # tiny config (CPU or TPU smoke)
  python tools/latency_bench.py --full         # S2-Pro scale (4B), random init
  ... --quant --chunk-frames 8 --scheduler-chunk 4

Prints one JSON line: {"ttfa_s": ..., "rtf": ..., "audio_s": ...}.
Warm-path numbers: one warm-up request runs first so compiles don't count.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="S2-Pro-scale LM + codec (random weights)")
    ap.add_argument("--quant", action="store_true", help="int8 weight-only LM")
    ap.add_argument("--kv-int8", action="store_true", help="int8 KV cache")
    ap.add_argument("--w8a8", action="store_true",
                    help="int8 activation x weight MXU matmuls")
    ap.add_argument("--pallas-attn", default="0",
                    help="decode attention: 0 | rows | blocks[N][-bf16] | stream[N]")
    ap.add_argument("--fused-fast", action="store_true",
                    help="fused fast-head sweep kernel (needs --quant)")
    ap.add_argument("--kv-layout", choices=["head", "pos"], default="head")
    ap.add_argument("--chunk-frames", type=int, default=8,
                    help="acoustic frames per emitted audio chunk")
    ap.add_argument("--first-chunk-frames", type=int, default=4,
                    help="frames in the FIRST audio chunk (smaller = lower "
                         "TTFA; 0 disables the small-first-chunk schedule)")
    ap.add_argument("--scheduler-chunk", type=int, default=1,
                    help="decode ticks per device dispatch")
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--cache-len", type=int, default=1024)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--text", default="Latency benchmark sentence, spoken "
                    "aloud to measure time to first audio.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from fish_speech_tpu.engine import GenerateLongRequest, TTSEngine
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.text import ByteTokenizer

    if args.full:
        from fish_speech_tpu.codec import init_dac_params, s2_pro_codec_config
        from fish_speech_tpu.models.config import s2_pro_lm_config

        cfg = s2_pro_lm_config(max_seq_len=args.cache_len)
        tokenizer = ByteTokenizer(n_semantic=cfg.codebook_size)
        import dataclasses

        cfg = dataclasses.replace(
            cfg, vocab_size=max(cfg.vocab_size, tokenizer.vocab_size),
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id)
        codec_cfg = s2_pro_codec_config()
    else:
        from fish_speech_tpu.codec import init_dac_params, tiny_codec_config
        from fish_speech_tpu.models.config import tiny_dual_ar_config

        tokenizer = ByteTokenizer(n_semantic=64)
        base = tiny_dual_ar_config()
        import dataclasses

        cfg = dataclasses.replace(
            base, vocab_size=tokenizer.vocab_size,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id)
        codec_cfg = tiny_codec_config()

    if args.kv_int8:
        import dataclasses

        cfg = dataclasses.replace(cfg, kv_cache_dtype="int8")
    if args.w8a8:
        import dataclasses

        cfg = dataclasses.replace(cfg, w8a8_matmuls=True)
    if args.pallas_attn not in ("0", ""):
        from fish_speech_tpu.models.config import apply_pallas_attn_mode

        cfg = apply_pallas_attn_mode(cfg, args.pallas_attn)
    if args.kv_layout != "head":
        cfg = dataclasses.replace(cfg, kv_cache_layout=args.kv_layout)
    if args.fused_fast and not args.quant:
        # match api_server: measuring "--fused-fast" without quantized
        # weights would silently time the XLA fast path instead
        raise SystemExit("--fused-fast needs --quant (the fused sweep "
                         "streams int8 weight tiles)")
    params = init_dual_ar_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    if args.quant:
        from fish_speech_tpu.ops.quant import quantize_lm_params

        params = jax.jit(quantize_lm_params)(params)
        print("# int8 weight-only", file=sys.stderr)
        if args.fused_fast:
            from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head

            params = enable_fused_fast_head(params)
            print("# fused fast head", file=sys.stderr)
    codec_params = init_dac_params(jax.random.key(1), codec_cfg)

    engine = TTSEngine(params, cfg, tokenizer, codec_params=codec_params,
                       codec_cfg=codec_cfg, cache_len=args.cache_len,
                       scheduler_slots=args.slots,
                       scheduler_chunk=args.scheduler_chunk)

    sr = codec_cfg.sample_rate

    def one_request(tag):
        req = GenerateLongRequest(text=args.text,
                                  max_new_tokens=args.max_new,
                                  chunk_length=400)
        t0 = time.perf_counter()
        ttfa = None
        samples = 0
        for wav in engine.stream_tts(req, chunk_frames=args.chunk_frames,
                                     first_chunk_frames=(
                                         args.first_chunk_frames or None)):
            if ttfa is None and len(wav):
                ttfa = time.perf_counter() - t0
            samples += len(wav)
        wall = time.perf_counter() - t0
        audio_s = samples / sr
        print(f"# {tag}: ttfa={ttfa:.3f}s wall={wall:.2f}s "
              f"audio={audio_s:.2f}s rtf={wall / max(audio_s, 1e-9):.3f}",
              file=sys.stderr)
        return ttfa, wall, audio_s

    one_request("warmup")       # compiles prefill/tick/vocoder programs
    ttfa, wall, audio_s = one_request("measure")
    print(json.dumps({
        "ttfa_s": round(ttfa, 4) if ttfa else None,
        "rtf": round(wall / max(audio_s, 1e-9), 4),
        "audio_s": round(audio_s, 3),
        "platform": jax.devices()[0].platform,
        "chunk_frames": args.chunk_frames,
        "first_chunk_frames": args.first_chunk_frames,
        "scheduler_chunk": args.scheduler_chunk,
    }))
    engine.scheduler.stop()


if __name__ == "__main__":
    main()
