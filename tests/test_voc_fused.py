"""Fused vocoder residual-stack kernel vs the reference-parity conv path."""

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.codec.init import _Rng, _res_unit_p
from fish_speech_tpu.codec.nn import residual_unit
from fish_speech_tpu.ops.voc_fused import fused_res_stack, pack_res_stack

_DILATIONS = (1, 3, 9)


def _ref_stack(units, x, dilations=_DILATIONS):
    for u, d in zip(units, dilations):
        x = residual_unit(u, x, d)
    return x


def test_fused_res_stack_matches_reference():
    c, tt, t, b = 16, 32, 96, 2
    rng = _Rng(jax.random.key(0))
    units = [_res_unit_p(rng, c) for _ in _DILATIONS]
    x = jax.random.normal(jax.random.key(1), (b, t, c), jnp.float32)

    ref = _ref_stack(units, x)
    got = fused_res_stack(x, pack_res_stack(units, dtype=jnp.float32), tt=tt)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_res_stack_single_unit():
    """n_units=1 path (the 768-channel stage runs one unit per call)."""
    c, tt, t = 8, 16, 64
    rng = _Rng(jax.random.key(2))
    units = [_res_unit_p(rng, c)]
    x = jax.random.normal(jax.random.key(3), (1, t, c), jnp.float32)
    ref = _ref_stack(units, x, dilations=(3,))
    got = fused_res_stack(x, pack_res_stack(units, dtype=jnp.float32),
                          tt=tt, dilations=(3,))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_res_stack_tile_independence():
    """Same result whatever the tile size (halo correctness)."""
    c, t = 8, 128
    rng = _Rng(jax.random.key(4))
    units = [_res_unit_p(rng, c) for _ in _DILATIONS]
    packed = pack_res_stack(units, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(5), (1, t, c), jnp.float32)
    a = fused_res_stack(x, packed, tt=32)
    bb = fused_res_stack(x, packed, tt=128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                               atol=1e-5, rtol=1e-5)


def test_fast_snake_matches_sin():
    """The kernel's polynomial sin^2 must be indistinguishable from the
    transcendental at bf16-relevant precision over a wide input range."""
    from fish_speech_tpu.ops.voc_fused import _snake

    import math

    x = jnp.asarray(np.linspace(-50, 50, 200001), jnp.float32)
    for a in (0.05, 0.3, 1.0, 4.0, 30.0):
        alpha = jnp.float32(a)
        inv = jnp.float32(1.0 / (a + 1e-9))
        exact = x + jnp.sin(alpha * x) ** 2 * inv
        got = _snake(x, jnp.float32(a / math.pi), inv)
        err = float(jnp.max(jnp.abs(got - exact)))
        # poly fit 6.9e-7 + f32 range-reduction rounding (|x| up to 50);
        # bf16 rounding on these magnitudes is ~4e-3, i.e. 100x larger
        assert err < 2e-5 / a + 2e-5, (a, err)


def test_fused_block_matches_chained_path():
    """fused_block (tconv + units [+ final conv] in one kernel) must match
    conv_transpose1d_mm + the reference unit stack — including the
    non-prepadded DMA branch (tt/stride >= pad_in) used at serving shapes."""
    from fish_speech_tpu.codec.fastpath import conv_transpose1d_mm
    from fish_speech_tpu.codec.nn import snake
    from fish_speech_tpu.ops.voc_fused import fused_block

    c_in, c, stride, t_in, b = 128, 128, 2, 144, 2
    rng = _Rng(jax.random.key(7))
    units = [_res_unit_p(rng, c) for _ in _DILATIONS]
    tw = jax.random.normal(jax.random.key(8), (2 * stride, c_in, c)) * 0.1
    tb = jax.random.normal(jax.random.key(9), (c,)) * 0.1
    x = jax.random.normal(jax.random.key(10), (b, t_in, c_in), jnp.float32)

    packed = pack_res_stack(units, dtype=jnp.float32)
    k_t = 2 * stride
    phases = []
    for j in range(k_t // stride):
        wj = jnp.flip(tw[k_t - (j + 1) * stride: k_t - j * stride], axis=0)
        phases.append(jnp.transpose(wj, (1, 0, 2)).reshape(c_in, stride * c))
    packed["tconv_pw"] = jnp.stack(phases)
    packed["tconv_pb"] = jnp.tile(tb.astype(jnp.float32), stride)[None, :]

    ref = conv_transpose1d_mm(x, tw, tb, stride=stride)
    ref = _ref_stack(units, ref)

    # tt=96 -> tt/stride=48 >= pad_in=48: the zero-fill DMA branch
    got = fused_block(x, packed, stride=stride, tt=96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    # tile independence across the prepadded/non-prepadded boundary
    got32 = fused_block(x, packed, stride=stride, tt=32)  # prepadded branch
    np.testing.assert_allclose(np.asarray(got32), np.asarray(got),
                               atol=2e-5, rtol=2e-5)

    # fused final conv + tanh (fk path, tt % 128 == 0)
    fkw = jax.random.normal(jax.random.key(11), (7, c)) * 0.1
    fkb = jnp.float32(0.03)
    final_w = jnp.concatenate(
        [fkw, jnp.zeros((1, c)).at[0, 0].set(fkb)]).astype(jnp.float32)
    from fish_speech_tpu.codec.fastpath import conv1d_mm
    xf = x[:, :128]
    reff = conv_transpose1d_mm(xf, tw, tb, stride=stride)
    reff = _ref_stack(units, reff)
    ref_wave = jnp.tanh(conv1d_mm(reff, fkw[:, :, None],
                                  fkb[None]))[..., 0]
    got_wave = fused_block(xf, packed, stride=stride, tt=128,
                           final_w=final_w)
    np.testing.assert_allclose(np.asarray(got_wave), np.asarray(ref_wave),
                               atol=2e-4, rtol=2e-4)
