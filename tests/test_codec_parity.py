"""Codec parity vs reference goldens (tests/goldens/codec_tiny.npz, generated
by tests/ref_harness/gen_goldens.py from the actual reference torch code).

Validates the full decode path (RVQ lookup -> post transformer -> upsample ->
vocoder) and the encode path (encoder -> downsample -> pre transformer -> RVQ).
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fish_speech_tpu.codec import (
    convert_dac_state_dict,
    dac_encode,
    dac_from_indices,
    init_dac_params,
    tiny_codec_config,
)
from fish_speech_tpu.codec.rvq import rvq_decode

GOLDEN = Path(__file__).parent / "goldens" / "codec_tiny.npz"


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():
        pytest.skip("goldens missing — run tests/ref_harness/gen_goldens.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    cfg = tiny_codec_config()
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("sd:")}
    return convert_dac_state_dict(sd, cfg)


def test_from_indices_parity(golden, params):
    cfg = tiny_codec_config()
    codes = golden["codes1"]
    ours = np.asarray(dac_from_indices(params, cfg, jnp.asarray(codes)))
    assert ours.shape == (codes.shape[0], codes.shape[2] * cfg.frame_length)
    np.testing.assert_allclose(ours, golden["golden_audio"][:, 0, :],
                               atol=2e-4, rtol=1e-3)


def test_rvq_decode_latent_parity(golden, params):
    cfg = tiny_codec_config()
    ours = np.asarray(rvq_decode(params["quantizer"], cfg.rvq,
                                 jnp.asarray(golden["codes2"])))
    # ours (B, T, D); golden channels-first (B, D, T)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), golden["golden_z"],
                               atol=1e-4, rtol=1e-3)


def test_encode_parity(golden, params):
    cfg = tiny_codec_config()
    result = dac_encode(params, cfg, jnp.asarray(golden["wav"]))
    ours = np.asarray(result.codes)
    assert ours.shape == tuple(golden["golden_codes"].shape)
    np.testing.assert_array_equal(np.asarray(result.code_lengths),
                                  golden["golden_lens"])
    match = (ours == golden["golden_codes"]).mean()
    # integer argmin near-ties under fp reordering can flip rare entries
    assert match > 0.99, f"code match ratio {match}"


def test_streaming_prefix_consistency(params):
    """The reference invariant (rvq.py:374-399): a causal codec's output on a
    truncated input must equal the prefix of the full-input output."""
    cfg = tiny_codec_config()
    rng = np.random.default_rng(3)
    n_q = cfg.rvq.total_codebooks
    codes = np.concatenate(
        [rng.integers(0, cfg.rvq.semantic_codebook_size, size=(1, 1, 16)),
         rng.integers(0, cfg.rvq.codebook_size, size=(1, n_q - 1, 16))],
        axis=1).astype(np.int32)

    full = np.asarray(dac_from_indices(params, cfg, jnp.asarray(codes)))
    part = np.asarray(dac_from_indices(params, cfg, jnp.asarray(codes[..., :7])))
    np.testing.assert_allclose(part, full[:, : part.shape[1]], atol=1e-4, rtol=1e-3)


def test_init_params_smoke():
    cfg = tiny_codec_config()
    p = init_dac_params(jax.random.key(0), cfg)
    codes = jnp.zeros((1, cfg.rvq.total_codebooks, 4), dtype=jnp.int32)
    wav = dac_from_indices(p, cfg, codes)
    assert wav.shape == (1, 4 * cfg.frame_length)
    enc = dac_encode(p, cfg, wav)
    assert enc.codes.shape[1] == cfg.rvq.total_codebooks


def test_mel_allclose_vs_reference(golden, params):
    """BASELINE.md headline quality target: >=0.99 mel allclose between our
    vocoder output and the reference's, using the reference's own mel
    parameters (utils/spectrogram.py)."""
    from fish_speech_tpu.utils.spectrogram import mel_similarity

    cfg = tiny_codec_config()
    ours = np.asarray(dac_from_indices(params, cfg,
                                       jnp.asarray(golden["codes1"])))
    ref = golden["golden_audio"][:, 0, :]
    score = min(mel_similarity(ours[i], ref[i]) for i in range(ours.shape[0]))
    assert score >= 0.99, f"mel allclose {score}"
