"""Merge LoRA factors into base weights and save a standalone checkpoint
(ref /root/reference/tools/llama/merge_lora.py, incl. its L1-difference
validation at 76-96)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", type=Path, required=True,
                   help="base checkpoint dir (our safetensors layout)")
    p.add_argument("--lora", type=Path, required=True,
                   help="LoRA checkpoint dir (flat factors)")
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--r", type=int, default=8)
    p.add_argument("--alpha", type=float, default=16.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.train.lora import LoraConfig, merge_lora
    from fish_speech_tpu.utils.checkpoint import load_params, save_params

    base, cfg = load_params(args.base)
    lora, _ = load_params(args.lora)
    lcfg = LoraConfig(r=args.r, lora_alpha=args.alpha)

    merged = merge_lora(base, lora, lcfg)

    # validation: merged weights must actually differ from base
    diff = sum(float(jnp.abs(a - b).sum())
               for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(merged)))
    if diff == 0.0:
        raise SystemExit("merged == base: LoRA had no effect (all-zero b?)")
    print(f"total L1 difference vs base: {diff:.4f}")

    save_params(args.output, merged, cfg)
    print(f"saved merged checkpoint -> {args.output}")


if __name__ == "__main__":
    main()
