"""Sampling distribution parity vs the reference sampler — deterministic:
both samplers' full probability vectors must match, which implies identical
draw distributions regardless of RNG."""

import numpy as np
import pytest

import jax.numpy as jnp

from fish_speech_tpu.ops.sampling import sampling_probs

from ref_harness import load_reference


def _reference_probs(logits_np, temperature, top_p, top_k):
    load_reference()
    import torch
    from fish_speech.models.text2semantic.inference import logits_to_probs

    return logits_to_probs(
        torch.from_numpy(logits_np),
        torch.tensor(temperature),
        torch.tensor(top_p),
        top_k,
    ).numpy()


@pytest.mark.parametrize("temperature,top_p,top_k", [
    (0.7, 0.7, 30),
    (1.0, 0.9, 30),
    (0.3, 1.0, 5),
    (1.5, 0.5, 64),
])
def test_distribution_matches_reference(temperature, top_p, top_k):
    rng = np.random.default_rng(0)
    vocab = 512
    for seed in range(3):
        logits = rng.standard_normal(vocab).astype(np.float32) * 3.0

        golden = _reference_probs(logits, temperature, top_p, top_k)
        ours = np.asarray(sampling_probs(
            jnp.asarray(logits)[None], jnp.float32(temperature),
            jnp.float32(top_p), top_k))[0]

        np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-4)
        # sanity: a proper distribution with at most top_k support
        assert abs(ours.sum() - 1.0) < 1e-5
        assert (ours > 0).sum() <= top_k
