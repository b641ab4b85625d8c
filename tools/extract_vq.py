"""Batch audio -> VQ-code extraction (ref /root/reference/tools/vqgan/
extract_vq.py): walks a corpus dir, encodes every audio file with the codec,
writes .npy codes next to the audio.

Multi-process: rank/world either from --rank/--world-size or SLURM env
(SLURM_PROCID/SLURM_NTASKS), files strided by rank — same contract as the
reference launcher."""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from fish_speech_tpu.utils.file import AUDIO_EXTENSIONS, list_files  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("folder", type=Path)
    p.add_argument("--codec-checkpoint", type=Path, default=None)
    p.add_argument("--rank", type=int,
                   default=int(os.environ.get("SLURM_PROCID", 0)))
    p.add_argument("--world-size", type=int,
                   default=int(os.environ.get("SLURM_NTASKS", 1)))
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--filelist", type=Path, default=None)
    args = p.parse_args()

    import jax

    from fish_speech_tpu.codec import (
        convert_dac_state_dict, init_dac_params, s2_pro_codec_config,
        tiny_codec_config)
    from fish_speech_tpu.engine import TTSEngine
    from fish_speech_tpu.serve.wav import decode_audio_bytes

    if args.codec_checkpoint:
        from fish_speech_tpu.utils.checkpoint import load_torch_codec_checkpoint

        cfg = s2_pro_codec_config()
        params = convert_dac_state_dict(
            load_torch_codec_checkpoint(args.codec_checkpoint), cfg)
    else:
        cfg = tiny_codec_config()
        params = init_dac_params(jax.random.key(0), cfg)

    if args.filelist:
        files = [Path(line) for line in
                 args.filelist.read_text().splitlines() if line.strip()]
    else:
        files = list_files(args.folder, AUDIO_EXTENSIONS, recursive=True)
    files = files[args.rank::args.world_size]
    print(f"[rank {args.rank}/{args.world_size}] {len(files)} files")

    # reuse the engine's bucketed jitted encoder
    engine = TTSEngine.__new__(TTSEngine)
    engine.codec_params = params
    engine.codec_cfg = cfg
    import jax as _jax
    from fish_speech_tpu.codec.model import dac_encode
    engine._jit_encoder = _jax.jit(lambda pp, w: dac_encode(pp, cfg, w))

    t0 = time.perf_counter()
    done = 0
    total_sec = 0.0
    for f in files:
        out = f.with_suffix(".npy")
        if out.exists():
            continue
        wav = decode_audio_bytes(f.read_bytes(), cfg.sample_rate)
        total_sec += len(wav) / cfg.sample_rate
        codes = TTSEngine.encode_reference(engine, wav)
        np.save(out, codes)
        done += 1
        if done % 50 == 0:
            dt = time.perf_counter() - t0
            print(f"[rank {args.rank}] {done} files, "
                  f"{total_sec / dt:.1f} audio-s/s")
    print(f"[rank {args.rank}] done: {done} files in "
          f"{time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
