"""Int8 weight-only PTQ CLI (ref /root/reference/tools/llama/quantize.py):
quantize a Dual-AR checkpoint (our safetensors layout) for 2x less decode
bandwidth."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=Path, required=True)
    p.add_argument("--output", type=Path, default=None,
                   help="default: <checkpoint>-<mode>")
    p.add_argument("--mode", choices=["int8", "int4", "w4a8"],
                   default="int8",
                   help="int8 = per-channel weight-only; int4 = groupwise "
                        "native-int4 checkpoint form; w4a8 = the runnable "
                        "TPU serving form (slow stack int4 nibble-packed "
                        "in int8, everything else int8 — see "
                        "ops/quant.py / QUANT_DRIFT.md)")
    p.add_argument("--groupsize", type=int, default=128,
                   help="int4 group size (ref uses g32/g64/g128)")
    args = p.parse_args()

    from fish_speech_tpu.ops.quant import quantize_lm_params
    from fish_speech_tpu.utils.checkpoint import load_params, save_params

    params, cfg = load_params(args.checkpoint)
    quantized = quantize_lm_params(params, mode=args.mode,
                                   groupsize=args.groupsize)
    out = args.output or args.checkpoint.with_name(
        args.checkpoint.name + "-" + args.mode)
    save_params(out, quantized, cfg)

    import jax

    orig = sum(x.nbytes for x in jax.tree.leaves(params))
    new = sum(x.nbytes for x in jax.tree.leaves(quantized))
    print(f"quantized {args.checkpoint} -> {out}: "
          f"{orig / 1e9:.2f} GB -> {new / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
