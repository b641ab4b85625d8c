"""In-context semantic-loss evaluation across checkpoints
(ref /root/reference/tools/llama/eval_in_context.py): per-frame codebook loss
curves on a fixed prompt+continuation, one curve per checkpoint. Prints a
TSV (frame, loss) per checkpoint; no matplotlib dependency required."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints", type=Path, nargs="+", required=True,
                   help="checkpoint dirs (our safetensors layout)")
    p.add_argument("--proto", type=Path, required=True,
                   help="a .protos shard to draw the eval sample from")
    p.add_argument("--tokenizer", type=Path, default=None)
    p.add_argument("--max-length", type=int, default=1024)
    p.add_argument("--output", type=Path, default=Path("eval_in_context.tsv"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.data import SemanticIterableDataset
    from fish_speech_tpu.models.config import DualARConfig
    from fish_speech_tpu.models.dual_ar import forward_train
    from fish_speech_tpu.text import load_tokenizer
    from fish_speech_tpu.utils.checkpoint import load_params

    tokenizer = load_tokenizer(args.tokenizer)

    rows = ["checkpoint\tframe\tloss"]
    for ckpt in args.checkpoints:
        params, cfg_dict = load_params(ckpt)
        cfg = DualARConfig(**{k: v for k, v in (cfg_dict or {}).items()
                              if k in DualARConfig.__dataclass_fields__})

        ds = SemanticIterableDataset([str(args.proto)], tokenizer, seed=0,
                                     max_length=args.max_length,
                                     num_codebooks=cfg.num_codebooks)
        item = next(iter(ds))
        tokens = item["tokens"][None, :, : args.max_length].astype(np.int32)
        labels = item["labels"][None, :, : args.max_length].astype(np.int32)

        out = forward_train(params, cfg, jnp.asarray(tokens),
                            labels=jnp.asarray(labels), remat=False)
        logits = np.asarray(out.codebook_logits, dtype=np.float32)[0]  # (T,K,C)
        lab = np.transpose(labels[0, 1:], (1, 0))                      # (T,K)
        tok = tokens[0, 0]
        sem = (tok >= cfg.semantic_begin_id) & (tok <= cfg.semantic_end_id)

        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                               .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        safe = np.clip(lab, 0, cfg.codebook_size - 1)
        nll = -np.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]  # (T,K)
        valid = sem[:, None] & (lab != -100)
        per_frame = np.where(valid.any(1),
                             (nll * valid).sum(1) / np.maximum(valid.sum(1), 1),
                             np.nan)
        for t, v in enumerate(per_frame):
            if np.isfinite(v):
                rows.append(f"{ckpt.name}\t{t}\t{v:.4f}")
        mean = np.nanmean(per_frame)
        print(f"{ckpt}: mean in-context semantic loss {mean:.4f}")

    args.output.write_text("\n".join(rows))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
