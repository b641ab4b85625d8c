"""Launch the TTS HTTP server (ref /root/reference/tools/api_server.py).

With --checkpoint/--codec-checkpoint absent, serves tiny random-weight models
(demo/smoke mode) so the full API surface is drivable without assets.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


_enable_compile_cache()


def build_engine(args):
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.engine import TTSEngine
    from fish_speech_tpu.text import ByteTokenizer, load_tokenizer

    if args.checkpoint:
        from fish_speech_tpu.models.config import DualARConfig
        from fish_speech_tpu.models.init import convert_dual_ar_state_dict
        from fish_speech_tpu.text.tokenizer import SEMANTIC_TOKEN_TEMPLATE
        from fish_speech_tpu.utils.checkpoint import load_torch_lm_checkpoint

        cfg = DualARConfig.from_json(args.checkpoint)
        tokenizer = load_tokenizer(args.checkpoint)
        cfg = cfg.with_semantic_range(tokenizer.semantic_begin_id,
                                      tokenizer.semantic_end_id)
        sd = load_torch_lm_checkpoint(args.checkpoint)
        params = convert_dual_ar_state_dict(sd, cfg, dtype=jnp.bfloat16)
    else:
        from fish_speech_tpu.models.config import DualARConfig
        from fish_speech_tpu.models.init import init_dual_ar_params

        tokenizer = ByteTokenizer(n_semantic=64)
        cfg = DualARConfig(
            vocab_size=tokenizer.vocab_size,
            n_layer=2, n_head=2, n_local_heads=2, dim=64, head_dim=32,
            intermediate_size=128, max_seq_len=2048,
            codebook_size=64, num_codebooks=4,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id,
            n_fast_layer=1, fast_dim=64, fast_n_head=2, fast_n_local_heads=2,
            fast_head_dim=32, fast_intermediate_size=128)
        params = init_dual_ar_params(jax.random.key(0), cfg)

    if getattr(args, "kv_cache", "native") != "native":
        import dataclasses

        cfg = dataclasses.replace(cfg, kv_cache_dtype=args.kv_cache)
    if getattr(args, "w8a8", False):
        import dataclasses

        cfg = dataclasses.replace(cfg, w8a8_matmuls=True)
    if getattr(args, "pallas_attn", "0") not in ("0", ""):
        from fish_speech_tpu.models.config import apply_pallas_attn_mode

        cfg = apply_pallas_attn_mode(cfg, args.pallas_attn)
    if getattr(args, "kv_layout", "head") != "head":
        import dataclasses

        if not (cfg.use_pallas_attention and cfg.pallas_attn_block_rows
                and cfg.pallas_attn_stream):
            raise SystemExit("--kv-layout pos needs --pallas-attn stream[N] "
                             "(the blocks/rows kernels index head-major)")
        cfg = dataclasses.replace(cfg, kv_cache_layout=args.kv_layout)
    if getattr(args, "fused_fast", False):
        from fish_speech_tpu.ops.fast_fused import enable_fused_fast_head
        from fish_speech_tpu.ops.quant import is_quantized

        if not is_quantized(params["fast_layers"]["attention"]["wqkv"]):
            raise SystemExit("--fused-fast needs an int8-quantized "
                             "checkpoint (tools/quantize.py)")
        params = enable_fused_fast_head(params)

    if args.codec_checkpoint:
        from fish_speech_tpu.codec import convert_dac_state_dict, s2_pro_codec_config
        from fish_speech_tpu.utils.checkpoint import load_torch_codec_checkpoint

        codec_cfg = s2_pro_codec_config()
        codec_params = convert_dac_state_dict(
            load_torch_codec_checkpoint(args.codec_checkpoint), codec_cfg)
    else:
        from fish_speech_tpu.codec import init_dac_params, tiny_codec_config

        codec_cfg = tiny_codec_config()
        codec_params = init_dac_params(jax.random.key(1), codec_cfg)

    return TTSEngine(params, cfg, tokenizer, codec_params=codec_params,
                     codec_cfg=codec_cfg, cache_len=args.cache_len,
                     scheduler_slots=getattr(args, "scheduler_slots", 0),
                     scheduler_chunk=getattr(args, "scheduler_chunk", 1),
                     prefill_chunk=getattr(args, "prefill_chunk", None),
                     vocoder_impl=getattr(args, "vocoder_impl", "auto"),
                     multihost=getattr(args, "multihost", False))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--listen", default="127.0.0.1:8080")
    parser.add_argument("--checkpoint", default=None,
                        help="Dual-AR checkpoint dir (reference layout)")
    parser.add_argument("--codec-checkpoint", default=None,
                        help="codec.pth path")
    parser.add_argument("--references-dir", default="references")
    parser.add_argument("--api-key", default=None)
    parser.add_argument("--cache-len", type=int, default=2048)
    parser.add_argument("--scheduler-slots", type=int, default=0,
                        help=">0 enables continuous batching with N decode slots")
    parser.add_argument("--kv-cache", choices=["native", "int8"],
                        default="native",
                        help="int8 halves KV-cache bandwidth/memory "
                             "(per-position symmetric quantization)")
    parser.add_argument("--scheduler-chunk", type=int, default=1,
                        help=">1 runs N decode ticks per device dispatch "
                             "(throughput mode; adds up to N tokens of "
                             "streaming latency)")
    parser.add_argument("--vocoder-impl", default="auto",
                        choices=["auto", "pallas", "lax", "mm"],
                        help="serving vocoder decode path; auto probes "
                             "pallas vs lax steady-state at startup and "
                             "keeps the faster")
    parser.add_argument("--prefill-chunk", type=int, default=None,
                        help="prompts longer than N tokens prefill one "
                             "N-token chunk per scheduler tick, interleaved "
                             "with decode ticks, so long cold prompts never "
                             "stall in-flight streams (needs "
                             "--scheduler-slots)")
    parser.add_argument("--w8a8", action="store_true",
                        help="int8 activation x int8 weight MXU matmuls for "
                             "quantized checkpoints (2x MXU rate; small "
                             "accuracy trade vs weight-only dequant)")
    parser.add_argument("--pallas-attn", default="0",
                        help="decode attention kernel: 0 (einsums), rows, or "
                             "blocks[N][-bf16] | stream[N] (Pallas kernels)")
    parser.add_argument("--fused-fast", action="store_true",
                        help="fused fast-head sweep kernel (one Pallas call "
                             "per codebook; needs an int8 checkpoint)")
    parser.add_argument("--kv-layout", choices=["head", "pos"],
                        default="head",
                        help="pos = position-major KV cache: contiguous "
                             "per-step writes (needs --pallas-attn stream)")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host serving via jax.distributed: "
                             "process 0 serves HTTP and broadcasts TickPlans"
                             "; other processes mirror its device programs "
                             "(needs --scheduler-slots, --coordinator, "
                             "--num-processes, --process-id)")
    parser.add_argument("--coordinator", default=None,
                        help="jax.distributed coordinator host:port "
                             "(--multihost)")
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    args = parser.parse_args()

    from aiohttp import web

    from fish_speech_tpu.serve.app import create_app

    if args.multihost:
        import jax

        if args.scheduler_slots <= 0:
            raise SystemExit("--multihost needs --scheduler-slots N")
        if args.coordinator is None:
            raise SystemExit("--multihost needs --coordinator host:port")
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    engine = build_engine(args)

    if args.multihost:
        import jax

        if jax.process_index() != 0:
            # follower: mirror the leader's plans forever (no HTTP)
            from fish_speech_tpu.serve.multihost import run_follower_loop

            print(f"multihost follower {jax.process_index()}/"
                  f"{jax.process_count()}: mirroring leader plans",
                  flush=True)
            run_follower_loop(engine.follower_batcher)
            return
    # warm-up: compile the decode path before accepting traffic
    # (ref tools/server/model_manager.py:80-93); the vocoder is run TWICE
    # per bucket so the remote runtime's one-time second-call cost is
    # absorbed here instead of on the first user requests
    from fish_speech_tpu.engine import GenerateLongRequest

    list(engine.generate_long(GenerateLongRequest(text="warmup", max_new_tokens=2)))
    if engine.codec_params is not None:
        engine.warmup_vocoder()

    app = create_app(engine, ref_dir=args.references_dir, api_key=args.api_key)
    host, port = args.listen.rsplit(":", 1)
    web.run_app(app, host=host, port=int(port))


if __name__ == "__main__":
    main()
