"""Fused fast-head sweep: one Pallas kernel per codebook position.

The fast residual-codebook head (ref llama.py:798-816 driven by
inference.py:146-174) is 28 layers x 9+1 sequential sweeps per decode step.
As discrete XLA ops that is ~2500 small fusions/step and — decisive on TPU —
the ~340 MB of fast-layer weights re-stream from HBM every sweep with only
~40% achieved bandwidth (measured v5e xplane: dots ~9 ms, norms/rope/residual
op-count ~6 ms, fast-cache attention ~2.5 ms of a 44 ms step at B=256).

This kernel runs ONE WHOLE SWEEP (all layers, one codebook position P) as a
single `pallas_call` over grid (L, 13): the 13 inner steps stream one
(dim, dim) int8 weight tile each — q, k, v rows of wqkv; wo; 3 row-tiles of
w1; 3 of w3; 3 column-tiles of w2 — so Mosaic's grid pipeline double-buffers
exactly 2 MB of weights while activations (B, dim) stay resident in VMEM for
the whole sweep. All five matmuls per layer are W8A8 int8 MXU dots with
`ops.quant.matmul_t` semantics (per-row activation scale x per-channel weight
scale). Attention is per-batch-row vector work (no shared operand -> no
matmul): scores fold the int8 KV through a lanes->heads segment-sum matmul
against a constant (dim, H) block mask, probs expand back with its (H, dim)
transpose.

Deviations from the XLA fast path (tolerance-tested, serving opt-in like
W8A8):
  - fast KV quantization scales are per (position, row) instead of per
    (position, row, head) — per-head maxes over the lane dim would force
    padded (B, H, D) layouts; one scale across the 16 fast heads costs <1e-2
    relative error on the tiny 10-slot cache;
  - cache layout is (L, K, B, dim) position-major (contiguous one-position
    writes and [0, P) prefix reads), created only by the fused path.

Requires the "3x" layer family (n_head == n_local_heads, n_head*head_dim ==
dim, intermediate == 3*dim — true of the S2-Pro fast stack, ref
README.md:118-122), int8-quantized weights, and static sweep positions
(cfg.unroll_fast_sweeps). Anything else falls back to the XLA path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILES = 14     # q, k, v, wo, w1 x3, w3 x3, w2 x3, pad
N_PHASES = 7     # tiles stream in PAIRS: one 2 MB block per grid step


class FusedFastCache(NamedTuple):
    """Position-major int8 fast KV cache (fused path only).

    Scales are per (position, row) but stored broadcast across 128 lanes in
    bf16: Mosaic HBM slices need a 128-aligned minor dim, and the (B, 128)
    form drops straight into the kernel's lane-padded score space. The
    broadcast costs 25% on top of the int8 value traffic."""
    k: jax.Array   # (L, K, B, dim) int8
    v: jax.Array   # (L, K, B, dim) int8
    ks: jax.Array  # (L, K, B, 128) bf16, lane-broadcast per-row scales
    vs: jax.Array  # (L, K, B, 128) bf16

    @staticmethod
    def create(n_layer: int, n_pos: int, batch: int, dim: int):
        z = jnp.zeros((n_layer, n_pos, batch, dim), jnp.int8)
        s = jnp.zeros((n_layer, n_pos, batch, 128), jnp.bfloat16)
        # optimization_barrier: an in-jit zeros-init consumed through a layer
        # scan can have its fill elided on TPU, leaving uninitialized memory
        # at unfilled positions (see KVCache.create) — force materialization.
        # Skip eagerly: there the fill is real and the barrier would copy.
        leaves = (z, jnp.zeros_like(z), s, jnp.zeros_like(s))
        if isinstance(z, jax.core.Tracer):
            leaves = jax.lax.optimization_barrier(leaves)
        return FusedFastCache(*leaves)


def pack_fast_stack(fast_layers: dict) -> dict:
    """Repack quantized fast-layer weights into the kernel's streaming form:
    {"w": (L, 13, dim, dim) int8, "s": (L, 13, dim) f32,
     "norms": (L, 2, dim) bf16}. Replaces params["fast_layers"] for decode
    (the originals can be dropped to keep HBM flat)."""
    att, ffn = fast_layers["attention"], fast_layers["feed_forward"]
    wqkv, wo = att["wqkv"], att["wo"]
    w1, w2, w3 = ffn["w1"], ffn["w2"], ffn["w3"]
    L, qkv_rows, dim = wqkv["q"].shape
    assert qkv_rows == 3 * dim and w1["q"].shape[1] == 3 * dim, (
        "fused fast head needs the 3x layer family")

    def rows3(wq):  # (L, 3*dim, dim) -> (L, 3, dim, dim)
        return wq.reshape(L, 3, dim, dim)

    w = jnp.concatenate([
        rows3(wqkv["q"]),
        wo["q"][:, None],
        rows3(w1["q"]),
        rows3(w3["q"]),
        w2["q"].reshape(L, dim, 3, dim).transpose(0, 2, 1, 3),  # column tiles
        jnp.zeros((L, 1, dim, dim), wqkv["q"].dtype),  # pad to 14 = 7 pairs
    ], axis=1)
    s = jnp.concatenate([
        wqkv["s"].reshape(L, 3, dim),
        wo["s"][:, None],
        w1["s"].reshape(L, 3, dim),
        w3["s"].reshape(L, 3, dim),
        jnp.broadcast_to(w2["s"][:, None], (L, 3, dim)),
        jnp.zeros((L, 1, dim), jnp.float32),
    ], axis=1).astype(jnp.float32)[:, :, None, :]  # (L, 14, 1, dim):
    # Mosaic blocks need the last two dims full or (8, 128)-aligned
    norms = jnp.stack([fast_layers["attention_norm"],
                       fast_layers["ffn_norm"]], axis=1).astype(jnp.bfloat16)
    return {"w": w, "s": s, "norms": norms}


def enable_fused_fast_head(params: dict) -> dict:
    """Serving-time transform: swap `fast_layers` for the packed streaming
    form. `decode_one_token` routes the fast head through the fused kernel
    whenever `fast_packed` is present (training/LoRA paths keep the original
    pytree). Requires int8-quantized params (quantize_lm_params).

    CONSUMES params["fast_layers"]: the repack runs as eager per-piece device
    ops (no surrounding jit) and drops each original leaf as soon as it is
    consumed, so the peak HBM overhead stays ~one extra copy of the fast
    stack for the duration of one concatenate — the 4B serving config runs
    ~250 MB from the HBM roof, and a host round-trip through the dev tunnel
    measures minutes."""
    fl = params.pop("fast_layers")
    out = dict(params)
    out["fast_packed"] = jax.tree.map(lambda x: x, pack_fast_stack(fl))
    del fl
    for leaf in jax.tree.leaves(out["fast_packed"]):
        leaf.block_until_ready()
    return out


def _rope_rows(freqs_table: jax.Array, pos: int, n_head: int) -> jax.Array:
    """(2, dim) f32 full-width cos/sin rows for `apply_rotary_emb` in flat
    (B, dim) form: cos/sin of pair i duplicated onto lanes 2i, 2i+1 and tiled
    across heads."""
    cs = freqs_table[pos].astype(jnp.float32)        # (D/2, 2)
    cos = jnp.repeat(cs[:, 0], 2)
    sin = jnp.repeat(cs[:, 1], 2)
    return jnp.stack([jnp.tile(cos, n_head), jnp.tile(sin, n_head)])


def _head_masks(dim: int, n_head: int):
    """(dim, 128) segment-sum mask and its (128, dim) expansion transpose.
    Scores live in a lane-padded (B, 128) space: columns >= n_head are all
    zero in both masks, so padding lanes never contribute to the output."""
    d = dim // n_head
    lane = jnp.arange(dim)[:, None] // d == jnp.arange(128)[None, :]
    msum = lane.astype(jnp.bfloat16)
    return msum, msum.T


def _quant_rows(xf: jax.Array):
    """matmul_t's per-row activation quantization (f32 in, int8 + scale)."""
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    return jnp.round(xf / xs).astype(jnp.int8), xs


def _fast_sweep_kernel(x_ref, w_ref, ws_ref, norm_ref, rope_ref, msum_ref,
                       mexp_ref, ck, cv, cks, cvs,
                       xo_ref, cko, cvo, ckso, cvso,
                       x_s, xq8, xqs, q_s, k8_s, v8_s, ksc_s, vsc_s,
                       attn_s, h2_s, h28_s, h2s_s, pre_k, pre_v, pre_ks,
                       pre_vs, rsem, wsem, *, pos, n_layer, n_head, eps):
    """Grid (L, 7): each step streams a PAIR of (dim, dim) int8 tiles (one
    2 MB block — pairing halves the per-grid-step overhead vs one tile per
    step; the 14th tile is zero padding). Phase map:
      0: q-proj + k-proj (rope, cache write)      [tiles q, k]
      1: v-proj + attention + wo + residual       [tiles v, wo]
      2: ffn norm/quant + silu(gate) slices 0,1   [tiles w1a, w1b]
      3: silu(gate) slice 2 + up slice 0          [tiles w1c, w3a]
      4: up slices 1,2                            [tiles w3b, w3c]
      5: quantize h2 + w2 partials 0,1            [tiles w2a, w2b]
      6: w2 partial 2 + residual (+ emit x)       [tiles w2c, pad]"""
    l = pl.program_id(0)
    t = pl.program_id(1)
    dim = x_s.shape[1]
    d = dim // n_head
    scale = 1.0 / math.sqrt(d)

    def w8a8(x8, xs, j):
        acc = jax.lax.dot_general(x8, w_ref[0, j], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs
                * ws_ref[0, j].astype(jnp.float32))

    def rms(xb, nw):
        xf = xb.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                               + eps)
        return n.astype(jnp.bfloat16) * nw

    def rope(xb):
        xf = xb.astype(jnp.float32)
        even = (jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1) % 2) == 0
        # circular lane shifts: +1 right; dim-1 right == 1 left (pairs are
        # adjacent lanes, so the wrap never lands on a selected lane)
        rot = jnp.where(even, -pltpu.roll(xf, xf.shape[1] - 1, 1),
                        pltpu.roll(xf, 1, 1))
        return (xf * rope_ref[0:1, :] + rot * rope_ref[1:2, :]
                ).astype(jnp.bfloat16)

    def quant_cache(xb):  # per-row int8 (attention() cache quant, row-wide)
        xf = xb.astype(jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
                         / 127.0, 1e-8)
        q8 = jnp.round(xf / sc).astype(jnp.int8)
        return q8, jnp.broadcast_to(sc.astype(jnp.bfloat16), (xf.shape[0],
                                                              128))

    def prefix_copies():
        return [
            pltpu.make_async_copy(ck.at[l, :pos], pre_k, rsem.at[0]),
            pltpu.make_async_copy(cv.at[l, :pos], pre_v, rsem.at[1]),
            pltpu.make_async_copy(cks.at[l, :pos], pre_ks, rsem.at[2]),
            pltpu.make_async_copy(cvs.at[l, :pos], pre_vs, rsem.at[3]),
        ]

    _WRITES = ((lambda: (k8_s, cko)), (lambda: (ksc_s, ckso)),
               (lambda: (v8_s, cvo)), (lambda: (vsc_s, cvso)))

    def write_copy(i):
        src, dst = _WRITES[i]()
        return pltpu.make_async_copy(src, dst.at[l, pos], wsem.at[i])

    @pl.when(t == 0)
    def _():  # init x + prefix reads; q tile (j=0) + k tile (j=1)
        @pl.when(l == 0)
        def _():
            x_s[:] = x_ref[:]
        if pos > 0:
            for c in prefix_copies():
                c.start()
        xn = rms(x_s[:], norm_ref[0, 0])
        x8, xs = _quant_rows(xn.astype(jnp.float32))
        xq8[:] = x8
        xqs[:] = xs
        q_s[:] = rope(w8a8(x8, xs, 0).astype(jnp.bfloat16))
        kb = rope(w8a8(x8, xs, 1).astype(jnp.bfloat16))
        k8, sc = quant_cache(kb)
        k8_s[:] = k8
        ksc_s[:] = sc
        write_copy(0).start()
        write_copy(1).start()

    @pl.when(t == 1)
    def _():  # v tile (j=0); attention; wo tile (j=1); residual
        vb = w8a8(xq8[:], xqs[:], 0).astype(jnp.bfloat16)
        v8, sc = quant_cache(vb)
        v8_s[:] = v8
        vsc_s[:] = sc
        write_copy(2).start()
        write_copy(3).start()
        for i in range(4):
            write_copy(i).wait()

        if pos > 0:
            for c in prefix_copies():
                c.wait()
        qb = q_s[:]
        msum = msum_ref[:]

        def score(k8, ksc):  # (B, dim) i8, (B, 128) bf16 -> (B, 128) f32
            qk = (qb * k8.astype(jnp.bfloat16)).astype(jnp.bfloat16)
            s = jnp.dot(qk, msum, preferred_element_type=jnp.float32)
            return s * ksc.astype(jnp.float32) * scale

        ss = [score(pre_k[p], pre_ks[p]) for p in range(pos)]
        ss.append(score(k8_s[:], ksc_s[:]))
        m = ss[0]
        for s in ss[1:]:
            m = jnp.maximum(m, s)
        es = [jnp.exp(s - m) for s in ss]
        denom = es[0]
        for e in es[1:]:
            denom = denom + e
        inv = 1.0 / denom
        out = jnp.zeros(qb.shape, jnp.float32)
        for p in range(pos + 1):
            v8 = v8_s[:] if p == pos else pre_v[p]
            vsc = vsc_s[:] if p == pos else pre_vs[p]
            pe = jnp.dot((es[p] * inv * vsc.astype(jnp.float32)
                          ).astype(jnp.bfloat16),
                         mexp_ref[:], preferred_element_type=jnp.float32)
            out = out + (pe.astype(jnp.bfloat16)
                         * v8.astype(jnp.bfloat16)).astype(jnp.float32)
        a8, asc = _quant_rows(out.astype(jnp.bfloat16).astype(jnp.float32))
        x_s[:] = x_s[:] + w8a8(a8, asc, 1).astype(jnp.bfloat16)

    def silu_slice(c, j):
        # silu in f32: Mosaic's bf16 `logistic` lowering emits a mixed
        # f32->bf16 vector.broadcast that fails MLIR verification
        g = w8a8(xq8[:], xqs[:], j).astype(jnp.bfloat16).astype(jnp.float32)
        h2_s[:, c * dim:(c + 1) * dim] = (
            g * jax.nn.sigmoid(g)).astype(jnp.bfloat16)

    def up_slice(c, j):
        u = w8a8(xq8[:], xqs[:], j).astype(jnp.bfloat16)
        h2_s[:, c * dim:(c + 1) * dim] = h2_s[:, c * dim:(c + 1) * dim] * u

    @pl.when(t == 2)
    def _():  # ffn norm/quant once; gate slices 0, 1
        fn = rms(x_s[:], norm_ref[0, 1])
        x8, xs = _quant_rows(fn.astype(jnp.float32))
        xq8[:] = x8
        xqs[:] = xs
        silu_slice(0, 0)
        silu_slice(1, 1)

    @pl.when(t == 3)
    def _():
        silu_slice(2, 0)
        up_slice(0, 1)

    @pl.when(t == 4)
    def _():
        up_slice(1, 0)
        up_slice(2, 1)

    def w2_partial(c, j):
        acc = jax.lax.dot_general(
            h28_s[:, c * dim:(c + 1) * dim], w_ref[0, j],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
        attn_s[:] = attn_s[:] + acc.astype(jnp.float32)

    @pl.when(t == 5)
    def _():  # quantize the (B, 3*dim) ffn hidden; w2 partials 0, 1
        h8, hs = _quant_rows(h2_s[:].astype(jnp.float32))
        h28_s[:] = h8
        h2s_s[:] = hs
        attn_s[:] = jnp.zeros(attn_s.shape, jnp.float32)
        w2_partial(0, 0)
        w2_partial(1, 1)

    @pl.when(t == N_PHASES - 1)
    def _():  # w2 partial 2 (j=0; tile 13 is padding); close the layer
        w2_partial(2, 0)
        y = attn_s[:] * h2s_s[:] * ws_ref[0, 0].astype(jnp.float32)
        x_s[:] = x_s[:] + y.astype(jnp.bfloat16)

        @pl.when(l == n_layer - 1)
        def _():
            xo_ref[:] = x_s[:]


@partial(jax.jit, static_argnames=("pos", "n_head", "eps", "interpret"))
def fused_fast_sweep(packed: dict, x: jax.Array, cache: FusedFastCache,
                     freqs_table: jax.Array, *, pos: int, n_head: int,
                     eps: float, interpret: bool | None = None):
    """Run one full fast-stack sweep at codebook position `pos` (static).

    x: (B, dim) bf16 residual-stream input. Returns (x_out (B, dim) bf16,
    cache with position `pos` written in place)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, dim = x.shape
    L = packed["w"].shape[0]
    rope = _rope_rows(freqs_table, pos, n_head)
    msum, mexp = _head_masks(dim, n_head)
    p_buf = max(pos, 1)

    grid = (L, N_PHASES)
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # x
            pl.BlockSpec((1, 2, dim, dim), lambda l, t: (l, t, 0, 0)),
            pl.BlockSpec((1, 2, 1, dim), lambda l, t: (l, t, 0, 0)),
            pl.BlockSpec((1, 2, dim), lambda l, t: (l, 0, 0)),        # norms
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # rope
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # msum
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # mexp
            pl.BlockSpec(memory_space=pltpu.ANY),                     # ck
            pl.BlockSpec(memory_space=pltpu.ANY),                     # cv
            pl.BlockSpec(memory_space=pltpu.ANY),                     # cks
            pl.BlockSpec(memory_space=pltpu.ANY),                     # cvs
    ]
    out_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # x_out
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, dim), jnp.bfloat16),
        jax.ShapeDtypeStruct(cache.k.shape, jnp.int8),
        jax.ShapeDtypeStruct(cache.v.shape, jnp.int8),
        jax.ShapeDtypeStruct(cache.ks.shape, jnp.bfloat16),
        jax.ShapeDtypeStruct(cache.vs.shape, jnp.bfloat16),
    ]
    xo, ck, cv, cks, cvs = pl.pallas_call(
        partial(_fast_sweep_kernel, pos=pos, n_layer=L, n_head=n_head,
                eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, dim), jnp.bfloat16),        # x_s
            pltpu.VMEM((b, dim), jnp.int8),            # xq8
            pltpu.VMEM((b, 1), jnp.float32),           # xqs
            pltpu.VMEM((b, dim), jnp.bfloat16),        # q_s
            pltpu.VMEM((b, dim), jnp.int8),            # k8_s
            pltpu.VMEM((b, dim), jnp.int8),            # v8_s
            pltpu.VMEM((b, 128), jnp.bfloat16),        # ksc_s
            pltpu.VMEM((b, 128), jnp.bfloat16),        # vsc_s
            pltpu.VMEM((b, dim), jnp.float32),         # attn_s / w2 acc
            pltpu.VMEM((b, 3 * dim), jnp.bfloat16),    # h2_s
            pltpu.VMEM((b, 3 * dim), jnp.int8),        # h28_s
            pltpu.VMEM((b, 1), jnp.float32),           # h2s_s
            pltpu.VMEM((p_buf, b, dim), jnp.int8),     # pre_k
            pltpu.VMEM((p_buf, b, dim), jnp.int8),     # pre_v
            pltpu.VMEM((p_buf, b, 128), jnp.bfloat16),  # pre_ks
            pltpu.VMEM((p_buf, b, 128), jnp.bfloat16),  # pre_vs
            pltpu.SemaphoreType.DMA((4,)),             # prefix reads
            pltpu.SemaphoreType.DMA((4,)),             # cache writes
        ],
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed["w"], packed["s"], packed["norms"],
      rope, msum, mexp, cache.k, cache.v, cache.ks, cache.vs)
    return xo, FusedFastCache(ck, cv, cks, cvs)
