"""Fused Pallas kernel for the vocoder's residual-unit stacks.

The decoder hot path (ref modded_dac.py:712-801) is, per stage, three
ResidualUnits: snake -> causal conv k7 (dilation 1/3/9) -> snake -> conv 1x1
-> residual. XLA lowers these convs at ~16% MXU utilization regardless of
formulation (measured: both `lax.conv_general_dilated` and an explicit
shifted-matmul form land at ~60 audio-s/s end-to-end, with per-conv fusions
at 11-22 ms against a 2.7 ms MXU floor), and every op round-trips the full
activation through HBM.

This kernel runs the WHOLE unit stack on one VMEM-resident time tile:

  grid (B, T/TT); per step one async DMA brings x[b, j*tt : j*tt+halo+tt]
  of the left-zero-padded input into VMEM (halo = 78 = total receptive
  field of the three dilated convs, rounded up for alignment), then for
  each unit u (dilation d):

      s   = snake(cur, alpha1)                      # VPU, f32
      c7  = sum_i  s[i*d : i*d+n] @ W7[u,i]         # 7 MXU dots, f32 accum
      y   = snake(c7, alpha2) @ W1[u] + b2          # MXU dot
      cur = cur[6d:] + y                            # residual, right-aligned

  shrinking the valid window by 6d rows per unit, and writes the final TT
  rows back. One HBM read + one write for the whole stack (vs 12 in the XLA
  path), weights VMEM-resident across the grid, all dots M >= tt with
  K = N = C on the MXU.

Weights are packed once per stage by `pack_res_stack`. C must be a multiple
of 8. The 3-unit weight set is ~7 MB of VMEM at C=384; the 768-channel first
stage passes n_units=1 slices (codec/fastpath.py drives this).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DILATIONS = (1, 3, 9)


def halo_for(dilations=_DILATIONS) -> int:
    """Left context consumed by the stack, rounded up to a sublane tile."""
    rf = 6 * sum(dilations)
    return -(-rf // 16) * 16  # bf16 sublane tile height


def pack_res_stack(units: list[dict], dtype=jnp.bfloat16,
                   quant: bool = False) -> dict:
    """Stack per-unit params: w7 (U,7,C,C), w1 (U,C,C), vec (U,6,C) f32 rows
    [alpha1/pi, 1/(alpha1+eps), alpha2/pi, 1/(alpha2+eps), b1, b2] (reciprocals
    precomputed so the kernel's snake needs no divide; eps=1e-9 matches
    nn.snake / dac Snake1d).

    quant=True additionally int8-quantizes the conv weights per
    (unit, out-channel) — the 7 taps of a unit's k7 conv SHARE one scale so
    the kernel can accumulate all taps in int32 and rescale once — and
    appends two vec rows [w7_colscale/127, w1_colscale/127]."""
    w7 = jnp.stack([u["conv1_w"] for u in units]).astype(dtype)
    w1 = jnp.stack([u["conv2_w"][0] for u in units]).astype(dtype)

    def vec(u):
        a1 = u["snake1_alpha"].astype(jnp.float32)
        a2 = u["snake2_alpha"].astype(jnp.float32)
        return jnp.stack([a1 * _INV_PI, 1.0 / (a1 + 1e-9),
                          a2 * _INV_PI, 1.0 / (a2 + 1e-9),
                          u["conv1_b"].astype(jnp.float32),
                          u["conv2_b"].astype(jnp.float32)])

    vecs = jnp.stack([vec(u) for u in units])
    if not quant:
        return {"w7": w7, "w1": w1, "vec": vecs}
    w7f = jnp.stack([u["conv1_w"] for u in units]).astype(jnp.float32)
    w1f = jnp.stack([u["conv2_w"][0] for u in units]).astype(jnp.float32)
    s7 = jnp.maximum(jnp.max(jnp.abs(w7f), axis=(1, 2)), 1e-12)  # (U, C)
    s1 = jnp.maximum(jnp.max(jnp.abs(w1f), axis=1), 1e-12)       # (U, C)
    q7 = jnp.round(w7f / s7[:, None, None, :] * 127.0).astype(jnp.int8)
    q1 = jnp.round(w1f / s1[:, None, :] * 127.0).astype(jnp.int8)
    vecs = jnp.concatenate(
        [vecs, (s7 / 127.0)[:, None], (s1 / 127.0)[:, None]], axis=1)
    return {"w7": q7, "w1": q1, "vec": vecs}


# sin^2(pi t) over t in [-1, 1] as a degree-7 polynomial in v = t^2:
# max abs error 8.9e-6 (least-squares fit on 400k points) — still ~450x
# below bf16 rounding (the kernel state dtype), i.e. numerically
# indistinguishable from jnp.sin here; one degree lower than the original
# 3.2e-7 fit shaves a horner step off the VPU's hottest loop (snakes are
# ~17% of decoder kernel time). The VPU's real sin measured as 2/3 of the
# whole kernel's runtime (57 -> 17 ms at C=128 with snakes removed).
# Range reduction truncates via an int32 round-trip: jnp.floor inside a
# Mosaic kernel lowers to a ~7000x slower scalar path (measured 10.8 s vs
# 1.6 ms for a (1024,128) tile), and the classic magic-constant trick
# ((y + 1.5*2^23) - 1.5*2^23) is folded away by XLA's algebraic simplifier.
_S2C = (9.86943246, -32.46507037, 42.68612315, -29.93828299, 12.78106835,
        -3.38355759, 0.45029592)
_INV_PI = 0.3183098861837907


def _snake(x, alpha_pi, inv_alpha):
    """snake(x) = x + sin^2(alpha*x)/(alpha+eps), f32 in/out.
    `alpha_pi` is alpha/pi PRE-MULTIPLIED at pack time — one VPU multiply
    per element per snake eval saved on the kernels' hottest loop."""
    y = alpha_pi * x
    t = y - y.astype(jnp.int32).astype(jnp.float32)   # frac, t in (-1, 1)
    v = t * t
    s2 = _S2C[-1]
    for cc in _S2C[-2::-1]:
        s2 = cc + v * s2
    s2 = v * s2
    return x + s2 * inv_alpha


def _quantize_tile(s):
    """f32 tile -> (int8 tile, scalar amax). Round-half-away via a signed
    0.5 pre-add (int8 cast truncates); values bounded by construction."""
    m = jnp.maximum(jnp.max(jnp.abs(s)), 1e-12)
    k = 127.0 / m
    q = (s * k + jnp.where(s >= 0, 0.5, -0.5)).astype(jnp.int8)
    return q, m


def _run_units(cur, w7_ref, w1_ref, vec_ref, tail_ref, *, tt: int, halo: int,
               dilations: tuple[int, ...], c: int, tail: bool,
               extra: int = 0):
    """The residual-unit sweep shared by both kernels: consume `cur`
    ((halo+tt, C), I/O dtype) and return the final TT valid rows (plus
    `extra` left-context rows for a fused follow-on conv; the stack's halo
    leaves 18 spare rows after three dilated units).

    State stays in the I/O dtype (bf16 serving): matches the reference's
    bf16 activations exactly (conv accumulation still f32 via the dots);
    halves VMEM traffic and VPU work vs carrying f32 state.

    int8 weights (pack_res_stack quant=True) switch the dots to the MXU's
    2x int8 rate: activations are quantized per TILE (one scalar amax per
    snake output — per-row scales would forbid int32 accumulation across
    the 7 shifted taps, whose terms mix different input rows), all taps
    accumulate in int32, and one f32 rescale (tile scale x channel scale)
    replaces nothing the f32 path didn't already pay."""
    quant = w7_ref.dtype == jnp.int8
    wt = w7_ref.dtype
    pad = halo
    for u, d in enumerate(dilations):
        rf = 6 * d
        n = pad + tt - rf                       # rows valid after this conv
        a1 = vec_ref[u, 0][None, :]
        ia1 = vec_ref[u, 1][None, :]
        a2 = vec_ref[u, 2][None, :]
        ia2 = vec_ref[u, 3][None, :]
        s = _snake(cur.astype(jnp.float32), a1, ia1)
        if quant:
            q, m = _quantize_tile(s)
            acc32 = jax.lax.dot(q[0 * d: 0 * d + n], w7_ref[u, 0],
                                preferred_element_type=jnp.int32)
            for i in range(1, 7):
                acc32 = acc32 + jax.lax.dot(q[i * d: i * d + n],
                                            w7_ref[u, i],
                                            preferred_element_type=jnp.int32)
            acc = (acc32.astype(jnp.float32)
                   * (vec_ref[u, 6][None, :] * (m * (1.0 / 127.0)))
                   + vec_ref[u, 4][None, :])
        else:
            s = s.astype(wt)
            acc = jnp.broadcast_to(vec_ref[u, 4][None, :],
                                   (n, c)).astype(jnp.float32)
            for i in range(7):
                acc = acc + jax.lax.dot(s[i * d: i * d + n], w7_ref[u, i],
                                        preferred_element_type=jnp.float32)
        s2 = _snake(acc, a2, ia2)
        if quant:
            q2, m2 = _quantize_tile(s2)
            y32 = jax.lax.dot(q2, w1_ref[u],
                              preferred_element_type=jnp.int32)
            y = (y32.astype(jnp.float32)
                 * (vec_ref[u, 7][None, :] * (m2 * (1.0 / 127.0))))
            y = y + vec_ref[u, 5][None, :]
        else:
            s2 = s2.astype(w1_ref.dtype)
            y = jax.lax.dot(s2, w1_ref[u],
                            preferred_element_type=jnp.float32)
            y = y + vec_ref[u, 5][None, :]
        cur = (cur[rf:].astype(jnp.float32) + y).astype(cur.dtype)
        pad -= rf
    assert pad >= extra, (pad, extra)
    out = cur[pad - extra:]
    if tail:
        # the next stage's entry snake (or the decoder-final snake) fused
        # here: it is consumed only by the following transposed conv, and
        # XLA's own sin lowering on these tensor sizes costs 10-100 ms
        out = _snake(out.astype(jnp.float32), tail_ref[0][None, :],
                     tail_ref[1][None, :]).astype(out.dtype)
    return out


def _res_stack_kernel(x_hbm, w7_ref, w1_ref, vec_ref, tail_ref, y_ref,
                      xbuf, sem, *, tt: int, halo: int,
                      dilations: tuple[int, ...], c: int, tail: bool):
    """Double-buffered: grid step (b, j) waits on the copy started at the
    previous step and starts the next tile's copy before computing."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    n_b = pl.num_programs(0)
    slot = (b * n_j + j) % 2  # global step parity (n_j may be odd)

    def copy_for(bb, jj, sl):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(jj * tt, halo + tt)], xbuf.at[sl],
            sem.at[sl])

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _():
        copy_for(0, 0, 0).start()

    # prefetch the next tile (wrapping to the next batch row)
    nxt_j = jnp.where(j + 1 < n_j, j + 1, 0)
    nxt_b = jnp.where(j + 1 < n_j, b, b + 1)

    @pl.when(jnp.logical_or(nxt_j > 0, nxt_b < n_b))
    def _():
        copy_for(nxt_b, nxt_j, 1 - slot).start()

    copy_for(b, j, slot).wait()
    cur = xbuf[slot][...]                       # (halo+tt, C)
    y_ref[0] = _run_units(cur, w7_ref, w1_ref, vec_ref, tail_ref, tt=tt,
                          halo=halo, dilations=dilations, c=c,
                          tail=tail).astype(y_ref.dtype)


def _block_kernel(x_hbm, pw_ref, pb_ref, w7_ref, w1_ref, vec_ref, tail_ref,
                  fw_ref, y_ref, xbuf, sem, *, tt: int, halo: int,
                  pad_in: int, stride: int, dilations: tuple[int, ...],
                  c: int, tail: bool, fk: int, prepadded: bool,
                  n_tiles: int):
    """Whole decoder block in one kernel: transposed conv (2 phase dots +
    reshape), residual-unit stack, fused tail snake.

    The input is the PRE-tconv activation (entry snake already applied by the
    previous stage's tail), left-padded with `pad_in` zero rows in XLA. Each
    grid step DMAs `pad_in + tt/stride` input rows, computes the two
    phase-expanded lag dots (ref modded_dac.py:712-801 tconv; the q=2 phase
    identity is derived in codec/fastpath.conv_transpose1d_mm), reshapes the
    (n_in, stride*C) f32 accumulator to time-major (n_in*stride, C) — a pure
    row-major relayout Mosaic supports at C % 128 == 0 — and runs the unit
    sweep on it. This removes the whole stage-boundary HBM round trip (write
    + pad-copy + re-read of the post-tconv activation) that dominated the
    chained-program cost (~100 ms/decode measured outside the kernels)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    n_b = pl.num_programs(0)
    slot = (b * n_j + j) % 2
    tt_in = tt // stride
    l_in = pad_in + tt_in

    # the input is normally NOT pre-padded (an XLA halo pad copies the whole
    # activation: 6-9 ms/decode across stages at (32,128)); the first tile
    # of each batch row instead zero-fills its pad_in context rows in VMEM
    # and DMAs only the tt_in real rows. Tiny shapes (tt_in < pad_in, where
    # interior tiles would need negative starts) fall back to a pre-padded
    # input (prepadded=True).
    if prepadded:
        def start(bb, jj, sl):
            pltpu.make_async_copy(x_hbm.at[bb, pl.ds(jj * tt_in, l_in)],
                                  xbuf.at[sl], sem.at[sl]).start()

        def wait(bb, jj, sl):
            pltpu.make_async_copy(x_hbm.at[bb, pl.ds(jj * tt_in, l_in)],
                                  xbuf.at[sl], sem.at[sl]).wait()
    else:
        def first_copy(bb, sl):
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(0, tt_in)],
                xbuf.at[sl, pl.ds(pad_in, tt_in)], sem.at[sl])

        def body_copy(bb, jj, sl):
            # start expressed as 16*(...) so Mosaic's divisibility analysis
            # can prove sublane alignment (jj*tt_in - pad_in defeats it)
            start16 = (jj * (tt_in // 16) - pad_in // 16) * 16
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(start16, l_in)],
                xbuf.at[sl], sem.at[sl])

        def start(bb, jj, sl):
            @pl.when(jj == 0)
            def _():
                first_copy(bb, sl).start()

            if n_tiles > 1:  # body_copy's slice is illegal when T_in < l_in
                @pl.when(jj > 0)
                def _():
                    body_copy(bb, jj, sl).start()

        def wait(bb, jj, sl):
            @pl.when(jj == 0)
            def _():
                first_copy(bb, sl).wait()

            if n_tiles > 1:
                @pl.when(jj > 0)
                def _():
                    body_copy(bb, jj, sl).wait()

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _():
        start(0, 0, 0)

    nxt_j = jnp.where(j + 1 < n_j, j + 1, 0)
    nxt_b = jnp.where(j + 1 < n_j, b, b + 1)

    @pl.when(jnp.logical_or(nxt_j > 0, nxt_b < n_b))
    def _():
        start(nxt_b, nxt_j, 1 - slot)

    wait(b, j, slot)

    if not prepadded:
        @pl.when(j == 0)
        def _():
            xbuf[slot, pl.ds(0, pad_in)] = jnp.zeros(
                (pad_in, xbuf.shape[2]), xbuf.dtype)
    n_in = (halo + tt) // stride
    a = pad_in - halo // stride
    if pw_ref.dtype == jnp.int8:
        # int8 tconv: one per-tile activation scale over the shared slab so
        # both lag dots accumulate in int32 with a single rescale
        slab = xbuf[slot][a - 1: a + n_in].astype(jnp.float32)
        q, m_in = _quantize_tile(slab)
        acc32 = jax.lax.dot(q[1:], pw_ref[0],
                            preferred_element_type=jnp.int32)
        acc32 = acc32 + jax.lax.dot(q[:-1], pw_ref[1],
                                    preferred_element_type=jnp.int32)
        acc = (acc32.astype(jnp.float32)
               * (pb_ref[1][None, :] * (m_in * (1.0 / 127.0)))
               + pb_ref[0][None, :])
    else:
        rows0 = xbuf[slot][a: a + n_in]             # lag 0
        rows1 = xbuf[slot][a - 1: a - 1 + n_in]     # lag 1 (zero at t=0)
        acc = jax.lax.dot(rows0, pw_ref[0],
                          preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot(rows1, pw_ref[1],
                                preferred_element_type=jnp.float32)
        acc = acc + pb_ref[0][None, :]
    cur = jnp.reshape(acc, (halo + tt, c))
    # rows before the sequence start model jnp.pad's zeros, not tconv output
    # (bias included) of zero inputs — mask them (when tt < halo this
    # reaches past the first tile: local row r is global j*tt + r - halo)
    row = jax.lax.broadcasted_iota(jnp.int32, (halo + tt, 1), 0)
    cur = jnp.where(row >= halo - j * tt, cur, 0.0)
    cur = cur.astype(xbuf.dtype)
    if fk == 0:
        y_ref[0] = _run_units(cur, w7_ref, w1_ref, vec_ref, tail_ref, tt=tt,
                              halo=halo, dilations=dilations, c=c,
                              tail=tail).astype(y_ref.dtype)
        return
    # fused decoder-final conv (k=fk, C -> 1) + tanh: the chained form costs
    # fk multiply-reduce fusions that each re-read the full (B, T, C)
    # activation from HBM (~20 ms/decode measured at (32,128)) plus the
    # kernel's own 2 GB output write; here the activation never leaves VMEM
    # and the kernel writes the (B, T) waveform directly.
    ext = _run_units(cur, w7_ref, w1_ref, vec_ref, tail_ref, tt=tt,
                     halo=halo, dilations=dilations, c=c, tail=tail,
                     extra=fk - 1).astype(jnp.float32)   # (tt+fk-1, C)
    m = ext[0: tt] * fw_ref[0][None, :]
    for i in range(1, fk):
        m = m + ext[i: i + tt] * fw_ref[i][None, :]
    wave = jnp.sum(jnp.reshape(m, (tt // 128, 128, c)), axis=-1)
    wave = jnp.tanh(wave + fw_ref[fk, 0])
    y_ref[0] = wave.astype(y_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("stride", "tt", "dilations", "interpret"))
def fused_block(x: jax.Array, packed: dict, *, stride: int, tt: int = 512,
                dilations: tuple[int, ...] = _DILATIONS,
                tail_vec: jax.Array | None = None,
                final_w: jax.Array | None = None,
                interpret: bool | None = None) -> jax.Array:
    """One decoder block (tconv k=2*stride + 3 residual units [+ tail snake])
    as a single pallas_call. x: (B, T_in, C_in) pre-tconv activation; packed
    needs "tconv_pw" (2, C_in, stride*C), "tconv_pb" (1, stride*C) f32 and
    the pack_res_stack keys. Returns (B, T_in*stride, C) in x.dtype — or,
    with final_w ((k+1, C) f32: k conv_out rows + a bias row), the fused
    decoder-final conv+tanh waveform (B, T_in*stride) instead.

    Numerics are identical to conv_transpose1d_phases + fused_res_stack
    (same dots, f32 accumulation, bf16 state) — parity is tested in
    tests/test_codec_fastpath.py."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_in, c_in = x.shape
    pw = packed["tconv_pw"]
    c = pw.shape[2] // stride
    t = t_in * stride
    assert t % tt == 0 and tt % stride == 0, (t, tt, stride)
    fk0 = 0 if final_w is None else final_w.shape[0] - 1
    # the fused final conv consumes fk-1 extra left-context rows
    halo = -(-(6 * sum(dilations) + max(fk0 - 1, 0)) // 16) * 16
    assert halo % stride == 0, (halo, stride)
    pad_in = -(-(halo // stride + 1) // 16) * 16
    # non-prepadded DMA needs interior starts >= 0 and 16-aligned tiles
    prepadded = tt // stride < pad_in or (tt // stride) % 16 != 0
    if prepadded:
        x = jnp.pad(x, ((0, 0), (pad_in, 0), (0, 0)))
    tail = tail_vec is not None
    if tail_vec is None:
        tail_vec = jnp.ones((2, c), jnp.float32)
    fk = fk0
    if final_w is None:
        final_w = jnp.zeros((1, c), jnp.float32)
    if fk:
        assert tt % 128 == 0, tt
        out_specs = pl.BlockSpec((1, tt // 128, 128), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, t // 128, 128), x.dtype)
    else:
        out_specs = pl.BlockSpec((1, tt, c), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, t, c), x.dtype)
    kernel = functools.partial(_block_kernel, tt=tt, halo=halo,
                               pad_in=pad_in, stride=stride,
                               dilations=tuple(dilations), c=c, tail=tail,
                               fk=fk, prepadded=prepadded, n_tiles=t // tt)
    weight_bytes = sum(int(packed[k].size) * packed[k].dtype.itemsize
                       for k in ("tconv_pw", "w7", "w1"))
    out = pl.pallas_call(
        kernel,
        grid=(b, t // tt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, pad_in + tt // stride, c_in), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 * 2 ** 20,
                                 weight_bytes + 24 * 2 ** 20)),
        interpret=interpret,
    )(x, pw, packed["tconv_pb"], packed["w7"], packed["w1"], packed["vec"],
      tail_vec, final_w)
    return out.reshape(b, t) if fk else out


@functools.partial(jax.jit, static_argnames=("tt", "dilations", "interpret"))
def fused_res_stack(x: jax.Array, packed: dict, *, tt: int = 512,
                    dilations: tuple[int, ...] = _DILATIONS,
                    tail_vec: jax.Array | None = None,
                    interpret: bool | None = None) -> jax.Array:
    """Apply the fused residual-unit stack. x: (B, T, C), T % tt == 0.

    Bit-for-intent equal to applying nn.residual_unit for each dilation in
    order (causal: left pad is zeros; f32 accumulation inside). Returns
    (B, T, C) in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = x.shape
    assert t % tt == 0, (t, tt)
    assert c % 8 == 0, c
    halo = halo_for(dilations)
    xp = jnp.pad(x, ((0, 0), (halo, 0), (0, 0)))

    tail = tail_vec is not None
    if tail_vec is None:
        tail_vec = jnp.ones((2, c), jnp.float32)
    kernel = functools.partial(_res_stack_kernel, tt=tt, halo=halo,
                               dilations=tuple(dilations), c=c, tail=tail)
    return pl.pallas_call(
        kernel,
        grid=(b, t // tt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, halo + tt, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, packed["w7"], packed["w1"], packed["vec"], tail_vec)
