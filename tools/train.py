"""Training CLI (ref /root/reference/fish_speech/train.py + configs/
text2semantic_finetune.yaml): finetune the Dual-AR model (full or LoRA) on
protobuf corpora, with checkpointing + auto-resume.

Scaling: one Mesh(data, model); batch data-parallel, weights tensor-parallel
(GSPMD inserts the collectives). Multi-host: `jax.distributed.initialize()`
picks up the TPU pod topology automatically when run under multihost launch.
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
    p = argparse.ArgumentParser()
    p.add_argument("--proto-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, default=Path("results"))
    p.add_argument("--checkpoint", type=Path, default=None,
                   help="base checkpoint (our layout); random tiny if absent")
    p.add_argument("--tokenizer", type=Path, default=None)
    p.add_argument("--lora", action="store_true")
    p.add_argument("--lora-r", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-length", type=int, default=4096)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--checkpoint-every", type=int, default=5000)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--data-parallel", type=int, default=0,
                   help="0 = auto (all devices data-parallel)")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--multihost", action="store_true")
    args = p.parse_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fish_speech_tpu.data import (
        SemanticIterableDataset, TextDataCollator, data_loader)
    from fish_speech_tpu.models.config import DualARConfig
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.parallel.mesh import (
        DATA_AXIS, MeshConfig, create_mesh, shard_dual_ar_params)
    from fish_speech_tpu.text import load_tokenizer
    from fish_speech_tpu.train import (
        TrainBatch, cosine_warmup_schedule, make_optimizer, make_train_step)
    from fish_speech_tpu.utils.checkpoint import load_params, save_params
    from fish_speech_tpu.utils.file import get_latest_checkpoint

    tokenizer = load_tokenizer(args.tokenizer)

    if args.checkpoint:
        params, cfg_dict = load_params(args.checkpoint, dtype=jnp.bfloat16)
        cfg = DualARConfig(**{k: v for k, v in cfg_dict.items()
                              if k in DualARConfig.__dataclass_fields__})
    else:
        cfg = DualARConfig(
            vocab_size=tokenizer.vocab_size, n_layer=4, n_head=4,
            n_local_heads=4, dim=128, head_dim=32, intermediate_size=256,
            max_seq_len=args.max_length, codebook_size=64, num_codebooks=4,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id,
            n_fast_layer=2, fast_dim=128)
        params = init_dual_ar_params(jax.random.key(0), cfg)

    # mesh
    n_dev = jax.device_count()
    model_par = args.model_parallel
    data_par = args.data_parallel or (n_dev // model_par)
    mesh = create_mesh(MeshConfig(data=data_par, model=model_par))
    params = shard_dual_ar_params(params, mesh)

    schedule = cosine_warmup_schedule(args.lr, args.warmup_steps, args.max_steps)

    start_step = 0
    args.output_dir.mkdir(parents=True, exist_ok=True)
    latest = get_latest_checkpoint(args.output_dir, "step_*")
    if latest is not None:
        params, _ = load_params(latest)
        params = shard_dual_ar_params(params, mesh)
        start_step = int(latest.name.split("_")[1])
        print(f"auto-resumed from {latest} (step {start_step})")

    ds = SemanticIterableDataset([str(args.proto_dir)], tokenizer,
                                 max_length=args.max_length,
                                 num_codebooks=cfg.num_codebooks)
    loader = data_loader(ds, TextDataCollator(tokenizer, args.max_length),
                         args.batch_size)

    if args.lora:
        import optax

        from fish_speech_tpu.train.lora import (
            LoraConfig, init_lora_params, make_lora_train_step)

        lcfg = LoraConfig(r=args.lora_r, lora_alpha=args.lora_alpha)
        lora = init_lora_params(jax.random.key(1), params, lcfg)
        optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                                optax.adamw(schedule, b1=0.9, b2=0.95))
        opt_state = optimizer.init(lora)
        step_fn = make_lora_train_step(cfg, params, lcfg, optimizer)
        state = lora
    else:
        optimizer = make_optimizer(params, schedule,
                                   weight_decay=args.weight_decay)
        opt_state = optimizer.init(params)
        step_fn = make_train_step(cfg, optimizer)
        state = params

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    t0 = time.perf_counter()
    with jax.sharding.set_mesh(mesh):
        for step_idx in range(start_step, args.max_steps):
            b = next(loader)
            batch = TrainBatch(
                inputs=jax.device_put(b["inputs"], batch_sharding),
                labels=jax.device_put(b["labels"], batch_sharding),
                attention_masks=jax.device_put(b["attention_masks"],
                                               batch_sharding))
            state, opt_state, metrics = step_fn(state, opt_state, batch)

            if (step_idx + 1) % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                print(f"step {step_idx + 1}: loss={m['loss']:.4f} "
                      f"base={m['base_loss']:.4f} sem={m['semantic_loss']:.4f} "
                      f"top5={m['top_5_accuracy']:.3f} "
                      f"gnorm={m['grad_norm']:.2f} "
                      f"({args.log_every / dt:.2f} it/s)")
                t0 = time.perf_counter()

            if (step_idx + 1) % args.checkpoint_every == 0 and \
                    jax.process_index() == 0:
                ckpt = args.output_dir / f"step_{step_idx + 1:09d}"
                if args.lora:
                    save_params(ckpt, state, None)
                else:
                    save_params(ckpt, state, cfg)
                print(f"saved {ckpt}")

    if jax.process_index() == 0:
        ckpt = args.output_dir / f"step_{args.max_steps:09d}_final"
        save_params(ckpt, state, None if args.lora else cfg)
        print(f"saved final {ckpt}")


if __name__ == "__main__":
    main()
