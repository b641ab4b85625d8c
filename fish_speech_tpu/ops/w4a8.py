"""W4A8 Pallas matmul: int8 activations x nibble-packed int4 groupwise
weights, unpacked IN VMEM (the whole point — the XLA formulation
materializes the unpacked int8 weights to HBM and measured 4x slower than
int8 W8A8 at the 4B decode shape, because the weight-bandwidth saving is
exactly what it spends).

Reference counterpart: the int4 path that executes inside the reference's
serving loop, `/root/reference/tools/llama/quantize.py:252-260`
(aten._weight_int4pack_mm).

Layout contract (ops/quant.quantize_weight_int4_packed):
  q4 (N, K/2) int8 — split-half packing: byte j = (v[j+K/2] << 4) | (v[j] & 0xF)
  gs (N, G) f32   — per (out-channel, K-group) scales, G = K/gsz

The kernel runs a grid over N tiles. Each step DMAs one (NT, K/2) packed
tile, sign-extend-unpacks it to (NT, K) int8 on the VPU (a lane-block
concat, no fine interleave), then accumulates G int8xint8->int32 MXU dots
of (M, gsz) x (gsz, NT), each rescaled by its group's scale row (gs is fed
TRANSPOSED (Gp, N) so a group's scales are one legal sublane row-slice).
Activation quantization and the per-row activation scale are applied
OUTSIDE (XLA fuses both into neighbors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_n_tile(n: int, k: int, n_tile: int) -> int:
    """Shared tile policy for both W4A8 kernels. VMEM budget: packed tile +
    int32 unpack temps + unpacked int8 + x8 + acc must stay well under
    ~14 MB. Cap, then take the largest lane-aligned divisor of n so odd
    out-dims (TP-sharded shapes, non-4B configs) tile instead of tripping
    the divisibility assert."""
    if n_tile == 0:
        cap = min(256 if k > 4096 else 512, n)
        n_tile = next((t for t in range(cap - cap % 128, 0, -128)
                       if n % t == 0), 0)
        if n_tile == 0:
            raise ValueError(f"no 128-aligned tile divides n={n}")
    n_tile = min(n_tile, n)
    assert n % n_tile == 0, (n, n_tile)
    return n_tile


def _w4a8_kernel(x_ref, w4_ref, gst_ref, out_ref, *, gsz: int):
    """x (M, K) int8 · unpack(w4 (NT, K/2)).T -> out (M, NT) f32."""
    w = w4_ref[:]                                   # (NT, K/2) int8
    w32 = w.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)   # sign-extend low
    hi = jnp.right_shift(jnp.left_shift(w32, 24), 28)   # sign-extend high
    unp = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)  # (NT, K)
    k = unp.shape[1]
    m = x_ref.shape[0]
    nt = w.shape[0]
    acc = jnp.zeros((m, nt), jnp.float32)
    for g in range(k // gsz):
        a = jax.lax.dot_general(
            x_ref[:, g * gsz:(g + 1) * gsz],
            unp[:, g * gsz:(g + 1) * gsz],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)       # (M, NT)
        acc = acc + a.astype(jnp.float32) * gst_ref[g][None, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("gsz", "n_tile", "interpret"))
def w4a8_matmul(x8: jax.Array, q4: jax.Array, gs: jax.Array, *,
                gsz: int = 128, n_tile: int = 0,
                interpret: bool | None = None) -> jax.Array:
    """(M, K) int8 @ unpack(q4 (N, K/2)).T with groupwise scales -> (M, N)
    f32 (pre activation-scale). M must be a multiple of 32 (int8 sublane
    tile); pad the batch outside."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x8.shape
    n, kh = q4.shape
    g = gs.shape[-1]
    assert kh * 2 == k and g * gsz == k, (x8.shape, q4.shape, gs.shape)
    assert m % 32 == 0, m
    n_tile = _pick_n_tile(n, k, n_tile)
    # transposed scales, sublane-padded: row g holds group g's N scales
    gp = -(-g // 8) * 8
    gst = jnp.zeros((gp, n), jnp.float32).at[:g].set(gs.T)
    kernel = functools.partial(_w4a8_kernel, gsz=gsz)
    return pl.pallas_call(
        kernel,
        grid=(n // n_tile,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((n_tile, kh), lambda i: (i, 0)),
            pl.BlockSpec((gp, n_tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, n_tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(x8, q4, gst)


def _w4a8_pc_kernel(x_ref, w4_ref, r16_ref, out_ref, *, gsz: int):
    """Per-channel-rescale variant: unpack int4 -> int8 with the per-group
    scale folded in as an integer multiply+shift, then ONE big-K int8 MXU
    dot. The grouped kernel's per-group f32 rescale is G x M x NT VPU madds
    + converts per tile (~5 ms/step across the 4B slow stack); here the
    rescale is (NT, K) integer work riding the unpack, and the per-channel
    f32 scale is applied outside with the activation scale.

    w8[n,k] = (q4[n,k] * r16[n,g] + 128) >> 8 with r16 = round(256 *
    (gs[n,g]/cs[n]) * 127/8), cs = max_g gs — exactly an int8 per-channel
    re-quantization of the int4 reconstruction (max |r16*q4| = 32512, no
    clip needed; added error ~0.2% of the group scale, far under the int4
    step)."""
    w = w4_ref[:]                                   # (NT, K/2) int8
    w32 = w.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(w32, 24), 28)
    unp = jnp.concatenate([lo, hi], axis=1)         # (NT, K) int32
    nt, k = unp.shape
    r = r16_ref[:]                                  # (NT, G) int32
    u3 = unp.reshape(nt, k // gsz, gsz)
    u3 = jnp.right_shift(u3 * r[:, :, None] + 128, 8)
    unp8 = u3.reshape(nt, k).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_ref[:], unp8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)           # (M, NT)
    out_ref[:] = acc.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("gsz", "n_tile", "interpret"))
def w4a8_matmul_pc(x8: jax.Array, q4: jax.Array, gs: jax.Array, *,
                   gsz: int = 128, n_tile: int = 0,
                   interpret: bool | None = None) -> jax.Array:
    """Per-channel-rescale W4A8: (M, K) int8 @ unpack(q4).T -> (M, N) f32
    (pre activation-scale; per-channel weight scale INCLUDED)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x8.shape
    n, kh = q4.shape
    g = gs.shape[-1]
    assert kh * 2 == k and g * gsz == k, (x8.shape, q4.shape, gs.shape)
    assert m % 32 == 0, m
    n_tile = _pick_n_tile(n, k, n_tile)
    cs = jnp.maximum(jnp.max(gs, axis=-1), 1e-12)       # (N,) f32
    r16 = jnp.round(256.0 * (gs / cs[:, None]) * (127.0 / 8.0)
                    ).astype(jnp.int32)                 # (N, G)
    # r16 columns must follow the SPLIT-HALF packed column order: packed
    # column j holds k=j (low nibble, groups [0, G/2)) and k=j+K/2 (high,
    # groups [G/2, G)) — the in-kernel reshape (NT, K) -> (NT, G, gsz)
    # after the lane-concat [lo|hi] visits exactly gs's natural order.
    kernel = functools.partial(_w4a8_pc_kernel, gsz=gsz)
    out = pl.pallas_call(
        kernel,
        grid=(n // n_tile,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((n_tile, kh), lambda i: (i, 0)),
            pl.BlockSpec((n_tile, g), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((m, n_tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(x8, q4, r16)
    s8 = cs * (8.0 / 127.0)
    return out * s8[None, :]


def matmul_t_w4a8_pallas(x: jax.Array, w: dict) -> jax.Array:
    """Drop-in for the W4A8 branch of ops/quant.matmul_t on TPU: per-row
    activation int8 quantization outside, kernel matmul, rescale outside.
    W4A8_KERNEL=pc selects the per-channel-rescale kernel (default grouped;
    see the kernel docstrings for the trade)."""
    import os

    lead = x.shape[:-1]
    k = x.shape[-1]
    xf = x.reshape(-1, k).astype(jnp.float32)
    m = xf.shape[0]
    mp = -(-m // 32) * 32
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    x8 = jnp.round(xf / xs).astype(jnp.int8)
    if mp != m:
        x8 = jnp.pad(x8, ((0, mp - m), (0, 0)))
    gsz = k // w["gs"].shape[-1]
    fn = (w4a8_matmul_pc if os.environ.get("W4A8_KERNEL") == "pc"
          else w4a8_matmul)
    y = fn(x8, w["q4"], w["gs"], gsz=gsz)
    y = y[:m] * xs
    return y.reshape(*lead, -1).astype(x.dtype)
