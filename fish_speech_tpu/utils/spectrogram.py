"""Log-mel spectrogram matching the reference parameters exactly
(/root/reference/fish_speech/utils/spectrogram.py: n_fft 2048, win 2048, hop
512, 128 mels, slaney scale+norm, center=False with symmetric reflect pad,
magnitude = sqrt(power + 1e-6), log-compressed with 1e-5 floor).

This is the metric kernel for the ≥0.99 mel-allclose parity target, and the
feature extractor for any mel-conditioned tooling. Pure numpy/JAX.
"""

from __future__ import annotations

import numpy as np


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    linear = 3.0 * f / 200.0
    log = min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log, linear)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    linear = 200.0 * m / 3.0
    log = min_log_hz * np.exp(logstep * (np.maximum(m, min_log_mel) - min_log_mel))
    return np.where(m >= min_log_mel, log, linear)


def melscale_fbanks(n_freqs: int, f_min: float, f_max: float, n_mels: int,
                    sample_rate: int) -> np.ndarray:
    """Slaney-scale, slaney-normalized filterbank (n_freqs, n_mels) —
    matches torchaudio.functional.melscale_fbanks(norm='slaney',
    mel_scale='slaney')."""
    freqs = np.linspace(0, sample_rate // 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max),
                          n_mels + 2)
    f_pts = _mel_to_hz_slaney(mel_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


def linear_spectrogram(y: np.ndarray, n_fft: int = 2048, win_length: int = 2048,
                       hop_length: int = 512) -> np.ndarray:
    """Magnitude STFT with the reference's padding (spectrogram.py:30-58).
    y: (T,) -> (n_fft//2+1, frames)."""
    pad_l = (win_length - hop_length) // 2
    pad_r = (win_length - hop_length + 1) // 2
    y = np.pad(y, (pad_l, pad_r), mode="reflect")
    window = np.hanning(win_length + 1)[:-1].astype(np.float64)

    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = (np.arange(n_fft)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    frames = y[idx] * window[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    mag = np.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-6)
    return mag.T.astype(np.float32)


def log_mel_spectrogram(y: np.ndarray, sample_rate: int = 44100,
                        n_fft: int = 2048, win_length: int = 2048,
                        hop_length: int = 512, n_mels: int = 128,
                        f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """(T,) waveform -> (n_mels, frames) log-mel, reference-exact params."""
    f_max = f_max or float(sample_rate // 2)
    linear = linear_spectrogram(y, n_fft, win_length, hop_length)
    fb = melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
    mel = fb.T @ linear
    return np.log(np.clip(mel, 1e-5, None))


def mel_similarity(wav_a: np.ndarray, wav_b: np.ndarray,
                   sample_rate: int = 44100) -> float:
    """Fraction of log-mel bins within atol 1e-2 + rtol 1e-2 — the
    'mel allclose' score reported against the reference vocoder."""
    n = min(len(wav_a), len(wav_b))
    ma = log_mel_spectrogram(wav_a[:n], sample_rate)
    mb = log_mel_spectrogram(wav_b[:n], sample_rate)
    close = np.isclose(ma, mb, atol=1e-2, rtol=1e-2)
    return float(close.mean())
