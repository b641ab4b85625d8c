"""End-to-end data tooling pipeline: audio -> extract_vq -> build_dataset ->
train steps (driving the actual CLI scripts, not library internals)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=2")


def _run(args, timeout=300):
    proc = subprocess.run([sys.executable, *args], cwd=REPO, env=ENV,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, f"{args}\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_extract_build_train(tmp_path):
    from fish_speech_tpu.serve.wav import encode_wav

    # 1. synth corpus: 2 speakers x 2 clips + transcripts
    corpus = tmp_path / "corpus"
    rng = np.random.default_rng(0)
    for spk in ("alice", "bob"):
        d = corpus / spk
        d.mkdir(parents=True)
        for i in range(2):
            wav = (0.2 * rng.standard_normal(3000)).astype(np.float32)
            (d / f"clip{i}.wav").write_bytes(encode_wav(wav, 44100))
            (d / f"clip{i}.lab").write_text(f"{spk} says thing {i}")

    # 2. extract codes (tiny random codec)
    out = _run(["tools/extract_vq.py", str(corpus)])
    assert "done" in out
    npys = list(corpus.rglob("*.npy"))
    assert len(npys) == 4

    # 3. build protobuf shards
    protos = tmp_path / "protos"
    out = _run(["tools/build_dataset.py", "--input", str(corpus),
                "--output", str(protos)])
    assert "4 sentences" in out
    assert list(protos.glob("*.protos"))

    # 4. a few training steps on the shards (tiny random model)
    results = tmp_path / "results"
    out = _run(["tools/train.py", "--proto-dir", str(protos),
                "--output-dir", str(results), "--max-steps", "3",
                "--batch-size", "2", "--max-length", "128",
                "--log-every", "1", "--checkpoint-every", "1000"],
               timeout=420)
    assert "step 3:" in out
    assert list(results.glob("step_*_final"))
