"""Streaming vocoder must produce exactly the full-decode waveform."""

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.codec import init_dac_params, tiny_codec_config
from fish_speech_tpu.codec.model import dac_from_indices
from fish_speech_tpu.codec.streaming import StreamingVocoder


def _codes(cfg, t, seed=0):
    rng = np.random.default_rng(seed)
    n_q = cfg.rvq.total_codebooks
    return np.concatenate(
        [rng.integers(0, cfg.rvq.semantic_codebook_size, size=(1, t)),
         rng.integers(0, cfg.rvq.codebook_size, size=(n_q - 1, t))],
        axis=0).astype(np.int32)


def test_streaming_matches_full_decode():
    cfg = tiny_codec_config()
    params = init_dac_params(jax.random.key(0), cfg)
    t = 61
    codes = _codes(cfg, t)

    full = np.asarray(dac_from_indices(params, cfg, jnp.asarray(codes)[None]))[0]

    # history chosen >= pre/post window (16 in tiny cfg) + conv slack
    sv = StreamingVocoder(params, cfg, chunk_frames=8, history_frames=24)
    chunks = []
    # feed incrementally in uneven pieces
    for piece in (codes[:, :5], codes[:, 5:23], codes[:, 23:23],
                  codes[:, 23:50], codes[:, 50:]):
        chunks.extend(sv.feed(piece))
    chunks.extend(sv.feed(final=True))

    streamed = np.concatenate(chunks)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5, rtol=1e-5)


def test_streaming_long_window_phase():
    cfg = tiny_codec_config()
    params = init_dac_params(jax.random.key(1), cfg)
    t = 120  # well past history+chunk -> exercises the sliding window
    codes = _codes(cfg, t, seed=2)

    full = np.asarray(dac_from_indices(params, cfg, jnp.asarray(codes)[None]))[0]
    sv = StreamingVocoder(params, cfg, chunk_frames=8, history_frames=24)
    chunks = list(sv.feed(codes, final=True))
    streamed = np.concatenate(chunks)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5, rtol=1e-5)


def test_stateful_streaming_matches_full_decode():
    """StatefulVocoder (carried conv ctx / transconv tails / windowed KV)
    must equal full decode on uneven incremental feeds."""
    from fish_speech_tpu.codec.streaming import StatefulVocoder

    cfg = tiny_codec_config()
    params = init_dac_params(jax.random.key(0), cfg)
    t = 61
    codes = _codes(cfg, t)

    full = np.asarray(dac_from_indices(params, cfg, jnp.asarray(codes)[None]))[0]
    sv = StatefulVocoder(params, cfg, chunk_frames=8)
    chunks = []
    for piece in (codes[:, :5], codes[:, 5:23], codes[:, 23:23],
                  codes[:, 23:50], codes[:, 50:]):
        chunks.extend(sv.feed(piece))
    chunks.extend(sv.feed(final=True))
    streamed = np.concatenate(chunks)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5, rtol=1e-5)

    # reset -> reusable for a second stream
    sv.reset()
    codes2 = _codes(cfg, 16, seed=9)
    full2 = np.asarray(dac_from_indices(params, cfg,
                                        jnp.asarray(codes2)[None]))[0]
    streamed2 = np.concatenate(list(sv.feed(codes2, final=True)))
    np.testing.assert_allclose(streamed2, full2, atol=1e-5, rtol=1e-5)


def test_stateful_streaming_long_past_window():
    """Stream well past the attention window so the rolling KV cache evicts."""
    from fish_speech_tpu.codec.streaming import StatefulVocoder

    cfg = tiny_codec_config()
    params = init_dac_params(jax.random.key(1), cfg)
    t = 120  # window is 16 in the tiny config
    codes = _codes(cfg, t, seed=2)

    full = np.asarray(dac_from_indices(params, cfg, jnp.asarray(codes)[None]))[0]
    sv = StatefulVocoder(params, cfg, chunk_frames=8)
    streamed = np.concatenate(list(sv.feed(codes, final=True)))
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5, rtol=1e-5)


def test_stateful_guards():
    """final=True flush poisons carried state -> feed raises until reset;
    exceeding the RoPE table (max_frames) raises instead of silently
    clamping positions (stream_tts reuses one vocoder across segments)."""
    import pytest
    from fish_speech_tpu.codec.streaming import StatefulVocoder

    cfg = tiny_codec_config()
    params = init_dac_params(jax.random.key(3), cfg)
    sv = StatefulVocoder(params, cfg, chunk_frames=8, max_frames=32)
    list(sv.feed(_codes(cfg, 5), final=True))  # ragged tail -> padded flush
    with pytest.raises(RuntimeError):
        list(sv.feed(_codes(cfg, 8)))
    sv.reset()
    list(sv.feed(_codes(cfg, 24)))  # fine after reset
    with pytest.raises(ValueError):
        list(sv.feed(_codes(cfg, 16)))  # 24+16 > max_frames=32
