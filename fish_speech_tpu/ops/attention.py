"""Pallas TPU kernel: KV-cache decode attention (single query position).

Replaces the XLA einsum chain for the decode hot loop (the reference leans on
torch SDPA with a forced MATH backend per step, ref inference.py:210;
llama.py:909-933). One fused kernel per (batch row, kv head):

  - the query group (G = n_head/n_kv_heads rows) and that head's full cache
    stripe live in VMEM (S*D*2B*2 ≈ 0.5 MB at S=1024, far under the 16 MB
    budget), so there is exactly one HBM read of K and V and no materialized
    (B, H, S) score tensor in HBM;
  - per-row validity (cache fill level and left-pad offset, for continuous
    batching) is applied inside the kernel from scalar-prefetched bounds;
  - softmax in fp32, output in the cache dtype.

Shapes: q (B, Hkv, G, D); k/v cache (B, Hkv, S, D); lengths/starts (B,).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(bounds_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)          # (G, D)
    k = k_ref[0, 0].astype(jnp.float32)          # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)          # (S, D)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (G, S)
    length = bounds_ref[b, 0]
    start = bounds_ref[b, 1]
    pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    valid = (pos < length) & (pos >= start)
    s = jnp.where(valid, s, jnp.float32(-1e30))

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0, 0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                            lengths: jax.Array, starts: jax.Array,
                            interpret: bool | None = None) -> jax.Array:
    """q: (B, Hkv, G, D); k/v: (B, Hkv, S, D); lengths/starts: (B,) int32.
    Returns (B, Hkv, G, D) in q.dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_cache.shape[2]
    scale = 1.0 / math.sqrt(d)
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)  # (B, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
    )
    return pl.pallas_call(
        partial(_decode_attn_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        interpret=interpret,
    )(bounds, q, k_cache, v_cache)


def _decode_attn_chunked_kernel(bounds_ref, q_ref, k_hbm, v_hbm, o_ref, *,
                                scale, chunk, seq):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = bounds_ref[b, 0]
    start = bounds_ref[b, 1]

    def inner(sk, sv, sem_k, sem_v):
        q = q_ref[0, 0].astype(jnp.float32)                 # (G, D)
        g, d = q.shape
        c0 = start // chunk
        c1 = pl.cdiv(length, chunk)

        def dma_k(ci, slot):
            return pltpu.make_async_copy(
                k_hbm.at[b, h, pl.ds(ci * chunk, chunk)], sk.at[slot],
                sem_k.at[slot])

        def dma_v(ci, slot):
            return pltpu.make_async_copy(
                v_hbm.at[b, h, pl.ds(ci * chunk, chunk)], sv.at[slot],
                sem_v.at[slot])

        # double-buffered: prefetch chunk i+1 while computing chunk i
        dma_k(c0, 0).start()
        dma_v(c0, 0).start()

        def body(ci, carry):
            m, l, acc = carry
            slot = (ci - c0) % 2
            nxt = (ci - c0 + 1) % 2

            @pl.when(ci + 1 < c1)
            def _():
                dma_k(ci + 1, nxt).start()
                dma_v(ci + 1, nxt).start()

            dma_k(ci, slot).wait()
            dma_v(ci, slot).wait()
            kc = sk[slot].astype(jnp.float32)                # (chunk, D)
            s = jnp.dot(q, kc.T, preferred_element_type=jnp.float32) * scale
            pos = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = (pos < length) & (pos >= start)
            s = jnp.where(valid, s, jnp.float32(-1e30))
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p, sv[slot].astype(jnp.float32),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((g, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((g, 1), jnp.float32)
        a0 = jnp.zeros((g, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(c0, c1, body, (m0, l0, a0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)

    pl.run_scoped(
        inner,
        sk=pltpu.VMEM((2, chunk, q_ref.shape[-1]), k_hbm.dtype),
        sv=pltpu.VMEM((2, chunk, q_ref.shape[-1]), v_hbm.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_decode_attention_chunked(q: jax.Array, k_cache: jax.Array,
                                    v_cache: jax.Array, lengths: jax.Array,
                                    starts: jax.Array, chunk: int = 128,
                                    interpret: bool | None = None) -> jax.Array:
    """Length-aware decode attention: DMAs only the FILLED cache chunks
    (`start..length` per row) instead of the whole stripe — at fill f the
    cache traffic drops by S/f, which is what dominates the step at large
    batch. Flash-style online softmax over chunks; numerics match
    `xla_decode_attention` exactly up to fp reordering."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_cache.shape[2]
    assert s % chunk == 0, (s, chunk)
    scale = 1.0 / math.sqrt(d)
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bb, hh, bounds: (bb, hh, 0, 0)),
    )
    return pl.pallas_call(
        partial(_decode_attn_chunked_kernel, scale=scale, chunk=chunk, seq=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        interpret=interpret,
    )(bounds, q, k_cache, v_cache)


def _decode_attn_stacked_kernel(bounds_ref, layer_ref, q_ref, k_hbm, v_hbm,
                                ks_hbm, vs_hbm, o_ref, *, scale, chunk,
                                int8_cache):
    """Grid (B, Hkv). Reads this layer's filled chunks of the FULL stacked
    (L, B, Hkv, S, D) cache straight from HBM (double-buffered DMA) — no
    per-layer slice copy, no traffic for unfilled positions. int8 mode DMAs
    the per-position scale chunks too and folds them into scores/probs."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    li = layer_ref[0]
    length = bounds_ref[b, 0]
    start = bounds_ref[b, 1]

    def inner(sk, sv, sks, svs, sem):
        q = q_ref[0, 0].astype(jnp.float32)                 # (G, D)
        g, d = q.shape
        c0 = start // chunk
        c1 = pl.cdiv(length, chunk)

        def dma(ci, slot):
            sl = pl.ds(ci * chunk, chunk)
            copies = [
                pltpu.make_async_copy(k_hbm.at[li, b, h, sl], sk.at[slot],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[li, b, h, sl], sv.at[slot],
                                      sem.at[slot, 1]),
            ]
            if int8_cache:
                # scales are (L, B, H, S): H is a tiled (sublane) dim there,
                # so a size-1 H slice is Mosaic-illegal — DMA the full-H
                # stripe (tiny: Hkv*chunk f32) and pick the head row in VMEM
                copies += [
                    pltpu.make_async_copy(ks_hbm.at[li, b, :, sl],
                                          sks.at[slot], sem.at[slot, 2]),
                    pltpu.make_async_copy(vs_hbm.at[li, b, :, sl],
                                          svs.at[slot], sem.at[slot, 3]),
                ]
            return copies

        for c in dma(c0, 0):
            c.start()

        def body(ci, carry):
            m, l, acc = carry
            slot = (ci - c0) % 2
            nxt = (ci - c0 + 1) % 2

            @pl.when(ci + 1 < c1)
            def _():
                for c in dma(ci + 1, nxt):
                    c.start()

            for c in dma(ci, slot):
                c.wait()
            kc = sk[slot].astype(jnp.float32)                # (chunk, D)
            s = jnp.dot(q, kc.T, preferred_element_type=jnp.float32) * scale
            if int8_cache:
                s = s * sks[slot, pl.ds(h, 1), :]            # (1, chunk)
            pos = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = (pos < length) & (pos >= start)
            s = jnp.where(valid, s, jnp.float32(-1e30))
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            if int8_cache:
                p = p * svs[slot, pl.ds(h, 1), :]
            acc_new = acc * corr + jnp.dot(
                p, sv[slot].astype(jnp.float32),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((g, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((g, 1), jnp.float32)
        a0 = jnp.zeros((g, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(c0, c1, body, (m0, l0, a0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)

    d = q_ref.shape[-1]
    hkv = k_hbm.shape[2]
    pl.run_scoped(
        inner,
        sk=pltpu.VMEM((2, chunk, d), k_hbm.dtype),
        sv=pltpu.VMEM((2, chunk, d), v_hbm.dtype),
        sks=pltpu.VMEM((2, hkv, chunk), jnp.float32),
        svs=pltpu.VMEM((2, hkv, chunk), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2, 4)),
    )


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_decode_attention_stacked(q: jax.Array, k_full: jax.Array,
                                    v_full: jax.Array,
                                    ks_full: jax.Array | None,
                                    vs_full: jax.Array | None,
                                    layer: jax.Array, lengths: jax.Array,
                                    starts: jax.Array, chunk: int = 128,
                                    interpret: bool | None = None) -> jax.Array:
    """Decode attention over ONE layer of the stacked cache, read in place.

    q: (B, Hkv, G, D); k/v_full: (L, B, Hkv, S, D) bf16 or int8;
    ks/vs_full: (L, B, Hkv, S) f32 scales (int8 mode) or None; layer: scalar
    int32. The carry-mode stack passes its full donated buffers here, so the
    XLA path's materialized per-layer dynamic_slice copy (measured 2.4 ms/step
    at B=128 on v5e) never happens, and only filled chunks move at all."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_full.shape[3]
    if s % chunk != 0:  # small caches (tests/tiny models): one chunk
        chunk = s
    scale = 1.0 / math.sqrt(d)
    int8_cache = ks_full is not None
    if ks_full is None:
        # dummy refs keep one kernel signature; never DMA'd in bf16 mode
        ks_full = jnp.zeros((1, 1, 1, s), jnp.float32)
        vs_full = ks_full
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda bb, hh, *_: (bb, hh, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bb, hh, *_: (bb, hh, 0, 0)),
    )
    return pl.pallas_call(
        partial(_decode_attn_stacked_kernel, scale=scale, chunk=chunk,
                int8_cache=int8_cache),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        interpret=interpret,
    )(bounds, jnp.asarray(layer, jnp.int32)[None], q, k_full, v_full,
      ks_full, vs_full)


def _decode_attn_stacked_rows_kernel(bounds_ref, layer_ref, q_ref, k_hbm,
                                     v_hbm, ks_hbm, vs_hbm, o_ref, *, scale,
                                     chunk, int8_cache, hkv, g):
    """Grid (B,). One program handles ALL kv heads of one batch row: each DMA
    moves a (Hkv, chunk, D) block of this layer's stacked cache (16x fewer,
    16x larger transfers than the per-(b,h) grid, which lost to the XLA
    einsums on DMA issue overhead), and all H = Hkv*G query heads share one
    block-diagonal MXU dot per chunk — scores across mismatched (q-head,
    kv-head) pairs are masked to -inf, so softmax and the probs@V dot stay
    exact while the MXU sees a single well-shaped (H, Hkv*chunk) matmul."""
    b = pl.program_id(0)
    li = layer_ref[0]
    length = bounds_ref[b, 0]
    start = bounds_ref[b, 1]

    def inner(sk, sv, sks, svs, sem):
        q = q_ref[0].astype(jnp.float32)                     # (H, D)
        h_all, d = q.shape
        c0 = start // chunk
        c1 = pl.cdiv(length, chunk)

        def dma(ci, slot):
            sl = pl.ds(ci * chunk, chunk)
            copies = [
                pltpu.make_async_copy(k_hbm.at[li, b, :, sl], sk.at[slot],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[li, b, :, sl], sv.at[slot],
                                      sem.at[slot, 1]),
            ]
            if int8_cache:
                copies += [
                    pltpu.make_async_copy(ks_hbm.at[li, b, :, sl],
                                          sks.at[slot], sem.at[slot, 2]),
                    pltpu.make_async_copy(vs_hbm.at[li, b, :, sl],
                                          svs.at[slot], sem.at[slot, 3]),
                ]
            return copies

        for c in dma(c0, 0):
            c.start()

        # block-diagonal validity: query row r attends kv head r // g only
        row_kvh = jax.lax.broadcasted_iota(jnp.int32, (h_all, hkv * chunk),
                                           0) // g
        col = jax.lax.broadcasted_iota(jnp.int32, (h_all, hkv * chunk), 1)
        col_kvh = col // chunk
        col_off = col % chunk

        def body(ci, carry):
            m, l, acc = carry
            slot = (ci - c0) % 2
            nxt = (ci - c0 + 1) % 2

            @pl.when(ci + 1 < c1)
            def _():
                for c in dma(ci + 1, nxt):
                    c.start()

            for c in dma(ci, slot):
                c.wait()
            if int8_cache:
                # dequant in VMEM (f32 multiply, bf16 for the MXU): same
                # numerics as the materialized-dequant einsum path
                kc = (sk[slot].astype(jnp.float32)
                      * sks[slot][..., None]).astype(jnp.bfloat16)
                vc = (sv[slot].astype(jnp.float32)
                      * svs[slot][..., None]).astype(jnp.bfloat16)
            else:
                kc = sk[slot]
                vc = sv[slot]
            kc = kc.reshape(hkv * chunk, d)                  # layout no-op
            vc = vc.reshape(hkv * chunk, d)
            s = jnp.dot(q.astype(jnp.bfloat16), kc.T,
                        preferred_element_type=jnp.float32) * scale
            pos = ci * chunk + col_off
            valid = (row_kvh == col_kvh) & (pos < length) & (pos >= start)
            s = jnp.where(valid, s, jnp.float32(-1e30))
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.dot(
                p.astype(jnp.bfloat16), vc,
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m0 = jnp.full((h_all, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((h_all, 1), jnp.float32)
        a0 = jnp.zeros((h_all, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(c0, c1, body, (m0, l0, a0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)

    d = q_ref.shape[-1]
    pl.run_scoped(
        inner,
        sk=pltpu.VMEM((2, hkv, chunk, d), k_hbm.dtype),
        sv=pltpu.VMEM((2, hkv, chunk, d), v_hbm.dtype),
        sks=pltpu.VMEM((2, hkv, chunk), jnp.float32),
        svs=pltpu.VMEM((2, hkv, chunk), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2, 4)),
    )


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_decode_attention_stacked_rows(
        q: jax.Array, k_full: jax.Array, v_full: jax.Array,
        ks_full: jax.Array | None, vs_full: jax.Array | None,
        layer: jax.Array, lengths: jax.Array, starts: jax.Array,
        chunk: int = 128, interpret: bool | None = None) -> jax.Array:
    """Row-batched variant of `pallas_decode_attention_stacked` (grid (B,)
    instead of (B, Hkv)): same in-place read of one layer's filled chunks of
    the (L, B, Hkv, S, D) cache, but all kv heads move in one DMA and all
    query heads share one MXU dot per chunk.

    q: (B, Hkv, G, D); returns (B, Hkv, G, D) in q.dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_full.shape[3]
    if s % chunk != 0:
        chunk = s
    scale = 1.0 / math.sqrt(d)
    int8_cache = ks_full is not None
    if ks_full is None:
        ks_full = jnp.zeros((1, 1, 1, s), jnp.float32)
        vs_full = ks_full
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)
    qf = q.reshape(b, hkv * g, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv * g, d), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, hkv * g, d), lambda bb, *_: (bb, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_decode_attn_stacked_rows_kernel, scale=scale, chunk=chunk,
                int8_cache=int8_cache, hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, d), q.dtype),
        interpret=interpret,
    )(bounds, jnp.asarray(layer, jnp.int32)[None], qf, k_full, v_full,
      ks_full, vs_full)
    return out.reshape(b, hkv, g, d)


def _decode_attn_blocks_kernel(bounds_ref, layer_ref, q_ref, k_hbm, v_hbm,
                               ks_hbm, vs_hbm, o_ref, *, scale, chunk,
                               int8_cache, int8_scores, rows, hkv, g):
    """Grid (B/rows,). One program handles a BLOCK of `rows` batch rows: each
    chunk DMA moves a (rows, Hkv, chunk, D) block of this layer's stacked
    cache (rows x larger, rows x fewer transfers than the grid-(B,) kernel,
    whose ~3.5 us/cell issue overhead x B*L cells/step lost to the einsums),
    and each row runs one block-diagonal MXU dot over all its query heads.
    int8_scores additionally quantizes q per (row, head) so the score dot
    runs on the int8 MXU with the k scales folded into the scores — the
    probs@V dot stays bf16 (prob quantization would cost accuracy for ~no
    bandwidth: V already moves as int8)."""
    cell = pl.program_id(0)
    b0 = cell * rows
    li = layer_ref[0]
    h_all = hkv * g

    lens = [bounds_ref[b0 + i, 0] for i in range(rows)]
    sts = [bounds_ref[b0 + i, 1] for i in range(rows)]
    min_start = sts[0]
    max_len = lens[0]
    for i in range(1, rows):
        min_start = jnp.minimum(min_start, sts[i])
        max_len = jnp.maximum(max_len, lens[i])

    def inner(sk, sv, sks, svs, sem):
        d = q_ref.shape[-1]
        qf = q_ref[:].astype(jnp.float32)                    # (rows, H, D)
        if int8_scores and int8_cache:
            qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
                             / 127.0, 1e-8)                  # (rows, H, 1)
            qi = jnp.round(qf / qs).astype(jnp.int8)
        c0 = min_start // chunk
        c1 = pl.cdiv(max_len, chunk)

        def dma(ci, slot):
            sl = pl.ds(ci * chunk, chunk)
            bs = pl.ds(b0, rows)
            copies = [
                pltpu.make_async_copy(k_hbm.at[li, bs, :, sl], sk.at[slot],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[li, bs, :, sl], sv.at[slot],
                                      sem.at[slot, 1]),
            ]
            if int8_cache:
                copies += [
                    pltpu.make_async_copy(ks_hbm.at[li, bs, :, sl],
                                          sks.at[slot], sem.at[slot, 2]),
                    pltpu.make_async_copy(vs_hbm.at[li, bs, :, sl],
                                          svs.at[slot], sem.at[slot, 3]),
                ]
            return copies

        for c in dma(c0, 0):
            c.start()

        # block-diagonal validity: query head r attends kv head r // g only
        row_kvh = jax.lax.broadcasted_iota(jnp.int32, (h_all, hkv * chunk),
                                           0) // g
        col = jax.lax.broadcasted_iota(jnp.int32, (h_all, hkv * chunk), 1)
        col_kvh = col // chunk
        col_off = col % chunk

        def body(ci, carry):
            slot = (ci - c0) % 2
            nxt = (ci - c0 + 1) % 2

            @pl.when(ci + 1 < c1)
            def _():
                for c in dma(ci + 1, nxt):
                    c.start()

            for c in dma(ci, slot):
                c.wait()

            out = []
            for i in range(rows):                            # static unroll
                m, l, acc = carry[i]
                k8 = sk[slot, i].reshape(hkv * chunk, d)
                if int8_scores and int8_cache:
                    s = jax.lax.dot_general(
                        qi[i], k8, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * (qs[i] * scale)
                else:
                    kb = k8.astype(jnp.bfloat16) if int8_cache else k8
                    s = jax.lax.dot_general(
                        qf[i].astype(kb.dtype), kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                if int8_cache:
                    s = s * sks[slot, i].reshape(1, hkv * chunk)
                pos = ci * chunk + col_off
                valid = ((row_kvh == col_kvh) & (pos < lens[i])
                         & (pos >= sts[i]))
                s = jnp.where(valid, s, jnp.float32(-1e30))
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                corr = jnp.exp(m - m_new)
                l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
                if int8_cache:
                    p = p * svs[slot, i].reshape(1, hkv * chunk)
                    vb = sv[slot, i].reshape(hkv * chunk, d).astype(
                        jnp.bfloat16)
                else:
                    vb = sv[slot, i].reshape(hkv * chunk, d)
                acc_new = acc * corr + jnp.dot(
                    p.astype(vb.dtype), vb,
                    preferred_element_type=jnp.float32)
                out.append((m_new, l_new, acc_new))
            return tuple(out)

        init = tuple((jnp.full((h_all, 1), -1e30, jnp.float32),
                      jnp.zeros((h_all, 1), jnp.float32),
                      jnp.zeros((h_all, d), jnp.float32))
                     for _ in range(rows))
        final = jax.lax.fori_loop(c0, c1, body, init)
        for i in range(rows):
            _, l, acc = final[i]
            o_ref[i] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)

    d = q_ref.shape[-1]
    pl.run_scoped(
        inner,
        sk=pltpu.VMEM((2, rows, hkv, chunk, d), k_hbm.dtype),
        sv=pltpu.VMEM((2, rows, hkv, chunk, d), v_hbm.dtype),
        sks=pltpu.VMEM((2, rows, hkv, chunk), jnp.float32),
        svs=pltpu.VMEM((2, rows, hkv, chunk), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2, 4)),
    )


@partial(jax.jit, static_argnames=("rows", "chunk", "int8_scores",
                                   "interpret"))
def pallas_decode_attention_blocks(
        q: jax.Array, k_full: jax.Array, v_full: jax.Array,
        ks_full: jax.Array | None, vs_full: jax.Array | None,
        layer: jax.Array, lengths: jax.Array, starts: jax.Array,
        rows: int = 16, chunk: int = 128, int8_scores: bool = True,
        interpret: bool | None = None) -> jax.Array:
    """Block-of-rows decode attention over ONE layer of the stacked cache
    (v3 of the in-place stacked kernels; see `_decode_attn_blocks_kernel`).

    q: (B, Hkv, G, D); k/v_full: (L, B, Hkv, S, D) bf16 or int8; ks/vs_full:
    (L, B, Hkv, S) f32 scales or None; layer scalar int32; lengths/starts
    (B,). Returns (B, Hkv, G, D) in q.dtype. Loop bounds per block are
    [min(starts)//chunk, max(cdiv(lengths, chunk))) with exact per-row
    masking, so heterogeneous fills (continuous batching) cost only the
    block's max extent."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_full.shape[3]
    if s % chunk != 0:
        chunk = s
    while b % rows != 0:
        rows //= 2
    rows = max(rows, 1)
    scale = 1.0 / math.sqrt(d)
    int8_cache = ks_full is not None
    if ks_full is None:
        ks_full = jnp.zeros((1, 1, 1, s), jnp.float32)
        vs_full = ks_full
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)
    qf = q.reshape(b, hkv * g, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, hkv * g, d), lambda bb, *_: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((rows, hkv * g, d), lambda bb, *_: (bb, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_decode_attn_blocks_kernel, scale=scale, chunk=chunk,
                int8_cache=int8_cache, int8_scores=int8_scores, rows=rows,
                hkv=hkv, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, d), q.dtype),
        interpret=interpret,
    )(bounds, jnp.asarray(layer, jnp.int32)[None], qf, k_full, v_full,
      ks_full, vs_full)
    return out.reshape(b, hkv, g, d)


def _decode_attn_stream_kernel(bounds_ref, layer_ref, *rest,
                               scale, chunk, int8_cache, int8_scores,
                               rows, hkv, g, ncells, pos_major,
                               fold=False):
    """Single grid step streaming ALL row-blocks: a flat (cell, chunk)
    cursor walks the filled chunks of every block in one lax.while_loop with
    the next DMA always in flight — unlike the grid-(B/rows,) blocks kernel,
    the first chunk of each block is prefetched during the previous block's
    tail, so no per-cell DMA latency is ever exposed.

    pos_major=True reads (L, S, B, Hkv, D) values and (L, B, S*Hkv) flat
    scales (element [l, b, s*hkv + h]): the merged score columns are then
    position-major (col = off*hkv + kvh) and the scale row for a batch row is
    a plain contiguous lane slice — no transposes or padded reshapes, which
    Mosaic cannot lower.

    fold=True additionally performs THIS layer's decode-step cache update
    in-kernel (the "KV-write fold"): the new (B, Hkv, D) k/v arrive raw,
    are int8-quantized on the VPU, and DMA'd into the (aliased) pos-major
    cache at `pos` BEFORE the first chunk fetch, so the chunk walk reads
    them back like any other row. The per-(row, head) scales cannot be
    DMA'd (the flat scale layout's minor offset pos*hkv is not 128-aligned)
    — they are returned as outputs for the caller's XLA DUS and PATCHED
    into the in-VMEM scale slabs for the current read."""
    if fold:
        (pos_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, nk_ref, nv_ref,
         o_ref, k_out, v_out, ksc_o, vsc_o,
         sk, sv, sks, svs, qi8_s, qsc_s, sem,
         wk8, wv8, tks, tvs, wsem) = rest
    else:
        (q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         sk, sv, sks, svs, qi8_s, qsc_s, sem) = rest
    li = layer_ref[0]
    h_all = hkv * g
    d = q_ref.shape[-1]

    if fold:
        wpos = pos_ref[0]
        bq = q_ref.shape[0]
        nk = nk_ref[...].astype(jnp.float32)            # (B, hkv, d)
        nv = nv_ref[...].astype(jnp.float32)
        ksc = jnp.maximum(jnp.max(jnp.abs(nk), axis=-1) / 127.0, 1e-8)
        vsc = jnp.maximum(jnp.max(jnp.abs(nv), axis=-1) / 127.0, 1e-8)
        wk8[0] = jnp.round(nk / ksc[..., None]).astype(jnp.int8)
        wv8[0] = jnp.round(nv / vsc[..., None]).astype(jnp.int8)
        ksc_o[...] = ksc
        vsc_o[...] = vsc
        # tiled (B, chunk*hkv) scale rows: lane col off*hkv + h holds
        # scale[b, h] for every off — the patch source for the chunk
        # containing `pos` (scratch refs: dynamic row reads below)
        tks[...] = jnp.broadcast_to(ksc[:, None, :],
                                    (bq, chunk, hkv)).reshape(bq,
                                                              chunk * hkv)
        tvs[...] = jnp.broadcast_to(vsc[:, None, :],
                                    (bq, chunk, hkv)).reshape(bq,
                                                              chunk * hkv)
        # the row write must complete before any chunk fetch can read it
        wk_cp = pltpu.make_async_copy(wk8.at[0], k_out.at[li, wpos],
                                      wsem.at[0])
        wv_cp = pltpu.make_async_copy(wv8.at[0], v_out.at[li, wpos],
                                      wsem.at[1])
        wk_cp.start()
        wv_cp.start()
        wk_cp.wait()
        wv_cp.wait()

    def row_bounds(b):
        return bounds_ref[b, 0], bounds_ref[b, 1]

    def cell_c0(cell):
        cb = jnp.minimum(cell, ncells - 1) * rows
        ms = row_bounds(cb)[1]
        for i in range(1, rows):
            ms = jnp.minimum(ms, row_bounds(cb + i)[1])
        return ms // chunk

    def cell_c1(cell):
        cb = jnp.minimum(cell, ncells - 1) * rows
        ml = row_bounds(cb)[0]
        for i in range(1, rows):
            ml = jnp.maximum(ml, row_bounds(cb + i)[0])
        return pl.cdiv(ml, chunk)

    # fold: read values through the ALIASED output refs — the same memory
    # on TPU, and the only refs that hold the in-kernel row write under
    # interpret mode (which does not share aliased buffers)
    k_src = k_out if fold else k_hbm
    v_src = v_out if fold else v_hbm

    def dma(cell, ci, slot):
        bs = pl.ds(cell * rows, rows)
        if pos_major:
            sl = pl.ds(ci * chunk, chunk)
            copies = [
                pltpu.make_async_copy(k_src.at[li, sl, bs], sk.at[slot],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(v_src.at[li, sl, bs], sv.at[slot],
                                      sem.at[slot, 1]),
            ]
            if int8_cache:
                fl = pl.ds(ci * chunk * hkv, chunk * hkv)
                copies += [
                    pltpu.make_async_copy(ks_hbm.at[li, bs, fl],
                                          sks.at[slot], sem.at[slot, 2]),
                    pltpu.make_async_copy(vs_hbm.at[li, bs, fl],
                                          svs.at[slot], sem.at[slot, 3]),
                ]
            return copies
        sl = pl.ds(ci * chunk, chunk)
        copies = [
            pltpu.make_async_copy(k_hbm.at[li, bs, :, sl], sk.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[li, bs, :, sl], sv.at[slot],
                                  sem.at[slot, 1]),
        ]
        if int8_cache:
            copies += [
                pltpu.make_async_copy(ks_hbm.at[li, bs, :, sl], sks.at[slot],
                                      sem.at[slot, 2]),
                pltpu.make_async_copy(vs_hbm.at[li, bs, :, sl], svs.at[slot],
                                      sem.at[slot, 3]),
            ]
        return copies

    row_kvh = jax.lax.broadcasted_iota(jnp.int32, (h_all, hkv * chunk),
                                       0) // g
    col = jax.lax.broadcasted_iota(jnp.int32, (h_all, hkv * chunk), 1)
    if pos_major:  # merged rows are position-major: col = off*hkv + kvh
        col_kvh = col % hkv
        col_off = col // hkv
    else:          # head-major merge: col = kvh*chunk + off
        col_kvh = col // chunk
        col_off = col % chunk

    use_i8 = int8_scores and int8_cache
    if use_i8:
        # loop-invariant: quantize all query rows once per (row, head) so the
        # score dots run on the int8 MXU with no per-chunk k bf16 convert.
        # Stored in scratch refs: dynamic row indexing inside the loop is
        # only legal on refs, not values, in Mosaic.
        qf = q_ref[:].astype(jnp.float32)
        qsc = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
                          / 127.0, 1e-8)
        qi8_s[:] = jnp.round(qf / qsc).astype(jnp.int8)
        qsc_s[:] = qsc

    def init_carry():
        return tuple((jnp.full((h_all, 1), -1e30, jnp.float32),
                      jnp.zeros((h_all, 1), jnp.float32),
                      jnp.zeros((h_all, d), jnp.float32))
                     for _ in range(rows))

    def body(state):
        cell, ci, slot, carry = state
        c1 = cell_c1(cell)
        last = ci + 1 >= c1
        nxt_cell = jnp.where(last, cell + 1, cell)
        nxt_ci = jnp.where(last, cell_c0(cell + 1), ci + 1)

        @pl.when(nxt_cell < ncells)
        def _():
            for c in dma(nxt_cell, nxt_ci, 1 - slot):
                c.start()

        for c in dma(cell, ci, slot):
            c.wait()

        out = []
        for i in range(rows):
            m, l, acc = carry[i]
            length, start = row_bounds(cell * rows + i)
            if pos_major:
                k8 = sk[slot, :, i].reshape(hkv * chunk, d)
            else:
                k8 = sk[slot, i].reshape(hkv * chunk, d)
            if use_i8:
                s = jax.lax.dot_general(
                    qi8_s[cell * rows + i], k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (qsc_s[cell * rows + i] * scale)
            else:
                kb = k8.astype(jnp.bfloat16) if int8_cache else k8
                qi = q_ref[cell * rows + i].astype(kb.dtype)
                s = jax.lax.dot_general(qi, kb, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ) * scale
            if int8_cache:
                # pos-major flat scales arrive already in merged-column
                # order; head-major slots merge naturally the same way
                srow = sks[slot, i].reshape(1, hkv * chunk)
                if fold:
                    # the freshly written row's scales are not in HBM yet
                    # (caller DUSes them after): patch them in
                    off = wpos - ci * chunk
                    srow = jnp.where(col_off[0:1] == off,
                                     tks[cell * rows + i].reshape(
                                         1, hkv * chunk), srow)
                s = s * srow
            pos = ci * chunk + col_off
            valid = ((row_kvh == col_kvh) & (pos < length) & (pos >= start))
            s = jnp.where(valid, s, jnp.float32(-1e30))
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            v_sl = sv[slot, :, i] if pos_major else sv[slot, i]
            if int8_cache:
                vrow = svs[slot, i].reshape(1, hkv * chunk)
                if fold:
                    off = wpos - ci * chunk
                    vrow = jnp.where(col_off[0:1] == off,
                                     tvs[cell * rows + i].reshape(
                                         1, hkv * chunk), vrow)
                p = p * vrow
                vb = v_sl.reshape(hkv * chunk, d).astype(jnp.bfloat16)
            else:
                vb = v_sl.reshape(hkv * chunk, d)
            acc_new = acc * corr + jnp.dot(p.astype(vb.dtype), vb,
                                           preferred_element_type=jnp.float32)

            @pl.when(last)
            def _(i=i, l_new=l_new, acc_new=acc_new):
                o_ref[cell * rows + i] = (
                    acc_new / jnp.maximum(l_new, 1e-20)).astype(o_ref.dtype)

            init = init_carry()[i]
            out.append(tuple(jnp.where(last, z, u) for z, u in
                             zip(init, (m_new, l_new, acc_new))))
        return nxt_cell, nxt_ci, 1 - slot, tuple(out)

    first_ci = cell_c0(0)
    for c in dma(0, first_ci, 0):
        c.start()
    jax.lax.while_loop(lambda s: s[0] < ncells, body,
                       (jnp.int32(0), first_ci, jnp.int32(0), init_carry()))


@partial(jax.jit, static_argnames=("rows", "chunk", "int8_scores",
                                   "pos_major", "interpret"))
def pallas_decode_attention_stream(
        q: jax.Array, k_full: jax.Array, v_full: jax.Array,
        ks_full: jax.Array | None, vs_full: jax.Array | None,
        layer: jax.Array, lengths: jax.Array, starts: jax.Array,
        rows: int = 16, chunk: int = 128, int8_scores: bool = False,
        pos_major: bool = False, interpret: bool | None = None) -> jax.Array:
    """Streaming decode attention over one layer of the stacked cache: like
    `pallas_decode_attention_blocks` but all B/rows blocks run in ONE grid
    step with cross-block DMA pipelining (see the kernel docstring).
    q: (B, Hkv, G, D) -> (B, Hkv, G, D).

    pos_major: values are (L, S, B, Hkv, D) and int8 scales are the FLAT
    (L, B, S*Hkv) form — decode cache writes become contiguous tile-aligned
    slices (the head-major layout costs ~30 us/layer of read-modify-write in
    XLA's dynamic_update_slice at 4B serving shapes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_full.shape[1] if pos_major else k_full.shape[3]
    if s % chunk != 0:
        chunk = s
    while b % rows != 0:
        rows //= 2
    rows = max(rows, 1)
    scale = 1.0 / math.sqrt(d)
    int8_cache = ks_full is not None
    if ks_full is None:
        ks_full = jnp.zeros((1, 1, 1), jnp.float32)
        vs_full = ks_full
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)
    qf = q.reshape(b, hkv * g, d)
    slot_shape = ((2, chunk, rows, hkv, d) if pos_major
                  else (2, rows, hkv, chunk, d))
    sc_shape = ((2, rows, hkv * chunk) if pos_major
                else (2, rows, hkv, chunk))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(slot_shape, k_full.dtype),
            pltpu.VMEM(slot_shape, v_full.dtype),
            pltpu.VMEM(sc_shape, jnp.float32),
            pltpu.VMEM(sc_shape, jnp.float32),
            pltpu.VMEM((b, hkv * g, d), jnp.int8),     # qi8 (int8_scores)
            pltpu.VMEM((b, hkv * g, 1), jnp.float32),  # q scales
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        partial(_decode_attn_stream_kernel, scale=scale, chunk=chunk,
                int8_cache=int8_cache, int8_scores=int8_scores, rows=rows,
                hkv=hkv, g=g, ncells=b // rows, pos_major=pos_major),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv * g, d), q.dtype),
        interpret=interpret,
    )(bounds, jnp.asarray(layer, jnp.int32)[None], qf, k_full, v_full,
      ks_full, vs_full)
    return out.reshape(b, hkv, g, d)


def pallas_decode_attention_stream_fold(
        q: jax.Array, k_full: jax.Array, v_full: jax.Array,
        ks_full: jax.Array, vs_full: jax.Array,
        layer: jax.Array, lengths: jax.Array, starts: jax.Array,
        new_k: jax.Array, new_v: jax.Array, write_pos: jax.Array,
        rows: int = 16, chunk: int = 128, int8_scores: bool = False,
        interpret: bool | None = None):
    """`pallas_decode_attention_stream` with the decode-step KV-cache write
    FOLDED into the kernel (pos-major int8 caches only): new_k/new_v are
    the raw (B, Hkv, D) post-RoPE rows; the kernel quantizes them, writes
    the int8 rows into the (aliased, donated) caches at `write_pos`, and
    attends over [start, write_pos] including the new row. Returns
    (out, k_full', v_full', k_scales, v_scales) — the caller must DUS the
    (B, Hkv) scales into the flat scale caches (their minor offset
    write_pos*hkv is not 128-aligned, so the kernel cannot).

    Saves the XLA quantize fusions + the two value dynamic_update_slices
    per layer per step (the 'scale DUS + misc' step bucket)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hkv, g, d = q.shape
    s = k_full.shape[1]
    if s % chunk != 0:
        chunk = s
    while b % rows != 0:
        rows //= 2
    rows = max(rows, 1)
    scale = 1.0 / math.sqrt(d)
    bounds = jnp.stack([lengths.astype(jnp.int32),
                        starts.astype(jnp.int32)], axis=1)
    qf = q.reshape(b, hkv * g, d)
    slot_shape = (2, chunk, rows, hkv, d)
    sc_shape = (2, rows, hkv * chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qf
            pl.BlockSpec(memory_space=pltpu.ANY),    # k_full
            pl.BlockSpec(memory_space=pltpu.ANY),    # v_full
            pl.BlockSpec(memory_space=pltpu.ANY),    # ks_full
            pl.BlockSpec(memory_space=pltpu.ANY),    # vs_full
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new_k
            pl.BlockSpec(memory_space=pltpu.VMEM),   # new_v
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o
            pl.BlockSpec(memory_space=pltpu.ANY),    # k_out (alias k_full)
            pl.BlockSpec(memory_space=pltpu.ANY),    # v_out (alias v_full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v scales
        ],
        scratch_shapes=[
            pltpu.VMEM(slot_shape, k_full.dtype),
            pltpu.VMEM(slot_shape, v_full.dtype),
            pltpu.VMEM(sc_shape, jnp.float32),
            pltpu.VMEM(sc_shape, jnp.float32),
            pltpu.VMEM((b, hkv * g, d), jnp.int8),
            pltpu.VMEM((b, hkv * g, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.VMEM((1, b, hkv, d), jnp.int8),    # staged k row
            pltpu.VMEM((1, b, hkv, d), jnp.int8),    # staged v row
            pltpu.VMEM((b, hkv * chunk), jnp.float32),  # tiled k scales
            pltpu.VMEM((b, hkv * chunk), jnp.float32),  # tiled v scales
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, k_new, v_new, ksc, vsc = pl.pallas_call(
        partial(_decode_attn_stream_kernel, scale=scale, chunk=chunk,
                int8_cache=True, int8_scores=int8_scores, rows=rows,
                hkv=hkv, g=g, ncells=b // rows, pos_major=True, fold=True),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv * g, d), q.dtype),
            jax.ShapeDtypeStruct(k_full.shape, k_full.dtype),
            jax.ShapeDtypeStruct(v_full.shape, v_full.dtype),
            jax.ShapeDtypeStruct((b, hkv), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv), jnp.float32),
        ],
        # alias indices count the scalar-prefetch operands: inputs are
        # [bounds, layer, pos, qf, k_full, v_full, ks, vs, new_k, new_v]
        input_output_aliases={4: 1, 5: 2},
        # the fold scratch (staged int8 rows + tiled scale patches) adds
        # ~3.5 MB over the base stream kernel, which already sits near the
        # default scoped-vmem limit at B=256 — raise it (chip capacity 128M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2 ** 20),
        interpret=interpret,
    )(bounds, jnp.asarray(layer, jnp.int32)[None],
      jnp.asarray(write_pos, jnp.int32)[None], qf, k_full, v_full,
      ks_full, vs_full, new_k, new_v)
    return out.reshape(b, hkv, g, d), k_new, v_new, ksc, vsc


def xla_decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                         lengths: jax.Array, starts: jax.Array) -> jax.Array:
    """Reference XLA path with identical semantics (used on CPU + in tests)."""
    b, hkv, g, d = q.shape
    s = k_cache.shape[2]
    scale = 1.0 / math.sqrt(d)
    scores = jnp.einsum("bhgd,bhkd->bhgk", q, k_cache) * scale
    pos = jnp.arange(s, dtype=jnp.int32)
    valid = ((pos[None, :] < lengths[:, None])
             & (pos[None, :] >= starts[:, None]))  # (B, S)
    scores = jnp.where(valid[:, None, None, :], scores.astype(jnp.float32),
                       jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhgk,bhkd->bhgd", probs, v_cache)
