"""Dual-AR transformer (slow token decoder + fast residual-codebook head).

TPU-native re-design of the reference model
(/root/reference/fish_speech/models/text2semantic/llama.py:249-827):

- pure-functional: parameters are a pytree, layers are *stacked* along a
  leading axis and iterated with `lax.scan` (compile time stays flat in
  depth, and the whole decode step fuses into one XLA program);
- KV caches are fixed-shape arrays `(L, B, S, H_kv, Dh)` updated with
  `dynamic_update_slice` — no in-place buffers, no dynamic shapes;
- GQA is expressed by broadcasting KV heads into query groups;
- RoPE tables are precomputed fp32->bf16 (matching the reference's rounding,
  llama.py:1003-1022) and applied in fp32.

Shapes: activations (B, T, D); token matrices (B, K+1, T) with row 0 the text
token and rows 1..K the codebook codes (ref content_sequence.py:282-324).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import as_weight, is_quantized, matmul_t, take_rows
from .config import AttnDims, DualARConfig


def param_dtype(params: dict):
    emb = params["embeddings"]
    return jnp.bfloat16 if is_quantized(emb) else emb.dtype


# ---------------------------------------------------------------------------
# Shared primitives
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight.astype(x.dtype)


def precompute_freqs_cis(seq_len: int, n_elem: int, base: float) -> jax.Array:
    """(T, n_elem//2, 2) bf16 table (ref llama.py:1003-1022)."""
    freqs = 1.0 / (base ** (np.arange(0, n_elem, 2)[: n_elem // 2].astype(np.float32) / n_elem))
    t = np.arange(seq_len, dtype=np.float32)
    angles = np.outer(t, freqs)
    cache = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(cache, dtype=jnp.bfloat16)


def apply_rotary_emb(x: jax.Array, freqs_cis: jax.Array) -> jax.Array:
    """x: (B, T, H, D); freqs_cis: (T, D//2, 2) or per-row (B, T, D//2, 2).
    fp32 math (ref llama.py:1025)."""
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    if freqs_cis.ndim == 4:
        fc = freqs_cis.astype(jnp.float32)[:, :, None, :, :]
    else:
        fc = freqs_cis.astype(jnp.float32)[None, :, None, :, :]
    real = xf[..., 0] * fc[..., 0] - xf[..., 1] * fc[..., 1]
    imag = xf[..., 1] * fc[..., 0] + xf[..., 0] * fc[..., 1]
    return jnp.stack([real, imag], axis=-1).reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention (optionally KV-cached)
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, H_kv, S, Dh) head-major, or (L, S, B, H_kv, Dh)
    v: jax.Array  # position-major (cfg.kv_cache_layout="pos": the per-step
    # write is then a contiguous tile-aligned slice)
    # int8 cache mode: per-(layer, row, head, position) dequant scales.
    # head-major: (L, B, H_kv, S) f32. pos-major: FLAT (L, B, S*H_kv) f32
    # with element [l, b, s*hkv + h] — matches the stream kernel's merged
    # position-major score columns, so the per-row scale is one contiguous
    # lane slice (a (L,S,B,H) or transposed form is either Mosaic-illegal
    # to slice or 16x lane-padded)
    ks: jax.Array | None = None
    vs: jax.Array | None = None

    @staticmethod
    def create(n_layer: int, batch: int, seq: int, n_kv: int, head_dim: int,
               dtype=jnp.bfloat16, pos_major: bool = False) -> "KVCache":
        """Zeroed cache. CALL EAGERLY (outside jit) unless the program fully
        overwrites every slot before reading: on the TPU backend, an in-jit
        zeros-init threaded through the carry-mode layer scan gets its zero
        fill elided, leaving uninitialized memory at unfilled positions —
        masked attention scores keep those columns at prob~0, but
        0 x NaN-garbage still poisons the output (observed as all-NaN hidden
        states on 3+ layer bf16 prefill; clean when created eagerly)."""
        if pos_major:
            shape = (n_layer, seq, batch, n_kv, head_dim)
            sshape = (n_layer, batch, seq * n_kv)
        else:
            shape = (n_layer, batch, n_kv, seq, head_dim)
            sshape = (n_layer, batch, n_kv, seq)
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        if dtype == jnp.int8:
            # distinct buffers: ks/vs must not alias (the decode programs
            # donate the whole cache; donating one buffer through two leaves
            # is an INVALID_ARGUMENT on the TPU runtime)
            leaves = (k, v, jnp.zeros(sshape, jnp.float32),
                      jnp.zeros(sshape, jnp.float32))
        else:
            leaves = (k, v)
        # optimization_barrier: defeat the zero-fill elision described above
        # for IN-JIT creation (the barrier makes the fill observable, so the
        # compiler must materialize it before the scan consumes the buffer).
        # Eagerly the buffers are real zeros already — and an eager barrier
        # is an identity COPY, transiently doubling a multi-GB cache.
        if isinstance(k, jax.core.Tracer):
            leaves = jax.lax.optimization_barrier(leaves)
        return KVCache(*leaves)


class StackedCacheView(NamedTuple):
    """Full stacked (L, ...) KV cache + the current layer index.

    The carry-mode layer scan passes this instead of a per-layer slice so the
    cache update is ONE dynamic_update_slice at (layer, ..., pos) on the full
    donated buffer — in place, no per-layer copies. The xs/ys scan mode
    double-buffers the whole cache (measured: 4B int8 B=256 OOMs at 18.3G on
    a 15.75G chip purely from that doubling)."""
    full: KVCache
    layer: jax.Array  # scalar int32


def attention(p: dict, ad: AttnDims, x: jax.Array, freqs_cis: jax.Array,
              mask: jax.Array, cache: "KVCache | StackedCacheView | None" = None,
              input_pos: jax.Array | None = None,
              pallas_bounds: tuple | None = None):
    """Returns (out, new_cache). cache holds per-layer (B, H_kv, S, D) slices
    (+ scales in int8 mode), or a StackedCacheView in carry mode.
    mask: (B or 1, 1, Tq, S) bool.
    pallas_bounds: optional (lengths (B,), starts (B,)) — routes the T=1
    cached case through the Pallas decode kernel instead of the einsum path."""
    b, t, _ = x.shape
    h, hkv, d = ad.n_head, ad.n_local_heads, ad.head_dim
    qkv = matmul_t(x, p["wqkv"], w8a8=ad.w8a8)
    if ad.qkv_bias:
        qkv = qkv + p["wqkv_b"]
    q, k, v = jnp.split(qkv, [h * d, h * d + hkv * d], axis=-1)
    q = q.reshape(b, t, h, d)
    k = k.reshape(b, t, hkv, d)
    v = v.reshape(b, t, hkv, d)

    if ad.qk_norm:
        q = rms_norm(q, p["q_norm"], 1e-5)
        k = rms_norm(k, p["k_norm"], 1e-5)

    q = apply_rotary_emb(q, freqs_cis)
    k = apply_rotary_emb(k, freqs_cis)

    new_cache = cache
    k_scale = v_scale = None
    if cache is not None:
        stacked = isinstance(cache, StackedCacheView)
        store = cache.full if stacked else cache
        li = cache.layer if stacked else None
        int8_cache = store.k.dtype == jnp.int8
        pos_major = ad.kv_pos_major
        assert not pos_major or stacked, (
            "kv_cache_layout='pos' needs the carry-mode stacked cache")
        # cache layout (B, H_kv, S, D); new k/v arrive as (B, T, H_kv, D)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        # KV-write fold: the streaming kernel quantizes + writes the new
        # row itself (and returns the scales for the flat-scale DUS) —
        # skip the whole XLA write section (opt-in, decode tick only)
        fold = (ad.kv_fold and stacked and pos_major and int8_cache
                and ad.pallas_stream and ad.pallas_block_rows > 0
                and ad.tp_shards == 1 and t == 1
                and jnp.ndim(input_pos) == 0
                and pallas_bounds is not None)
        if fold:
            fold_nk = kt[:, :, 0]          # (B, Hkv, D) post-RoPE, raw
            fold_nv = vt[:, :, 0]
            ck, cv, cks, cvs = store.k, store.v, store.ks, store.vs
        if not fold and int8_cache:
            # per-(row, head, position) symmetric int8 — halves cache
            # bandwidth, which dominates the step at large batch*seq
            k_sc = jnp.maximum(jnp.max(jnp.abs(kt.astype(jnp.float32)),
                                       axis=-1) / 127.0, 1e-8)
            v_sc = jnp.maximum(jnp.max(jnp.abs(vt.astype(jnp.float32)),
                                       axis=-1) / 127.0, 1e-8)
            kt = jnp.round(kt.astype(jnp.float32) / k_sc[..., None])
            vt = jnp.round(vt.astype(jnp.float32) / v_sc[..., None])
        kt = kt.astype(store.k.dtype)
        vt = vt.astype(store.v.dtype)
        if fold:
            pass                           # the kernel writes the row
        elif jnp.ndim(input_pos) == 0:
            # all rows write the same slot range (single-utterance / prefill)
            # NOTE an (S*D)-merged flat view for this write was tried and
            # MEASURED CATASTROPHIC (27.5 -> 0.6 steps/s at 4B B=256): the
            # 5D<->4D reshape changes the int8 (8,128)(4,1) tiled layout, so
            # XLA materializes a relayout copy of the whole 3.6 GB cache
            # every layer. Keep the native-form dynamic_update_slice.
            if stacked and pos_major:
                # position-major: the write is a contiguous, tile-aligned
                # (T, B, Hkv, D) slab at an untiled S index — no RMW
                ck = jax.lax.dynamic_update_slice(
                    store.k, kt.transpose(2, 0, 1, 3)[None],
                    (li, input_pos, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    store.v, vt.transpose(2, 0, 1, 3)[None],
                    (li, input_pos, 0, 0, 0))
                if int8_cache:
                    # flat scales are shard-blocked for TP (tp_shards=1 is
                    # one plain DUS): shard j owns the contiguous span
                    # [j*S*hl, (j+1)*S*hl) holding ITS heads' s-major flat,
                    # so a model-axis split of the last dim hands each
                    # device exactly the local layout the stream kernel
                    # expects (hl = Hkv/tp_shards)
                    hkv_ = k_sc.shape[1]
                    ns = ad.tp_shards
                    hl = hkv_ // ns
                    span = store.ks.shape[2] // ns  # S * hl
                    cks, cvs = store.ks, store.vs
                    for j in range(ns):
                        ksf = (k_sc[:, j * hl:(j + 1) * hl]
                               .transpose(0, 2, 1).reshape(b, -1))
                        vsf = (v_sc[:, j * hl:(j + 1) * hl]
                               .transpose(0, 2, 1).reshape(b, -1))
                        off = j * span + input_pos * hl
                        cks = jax.lax.dynamic_update_slice(
                            cks, ksf[None], (li, 0, off))
                        cvs = jax.lax.dynamic_update_slice(
                            cvs, vsf[None], (li, 0, off))
            elif stacked:
                ck = jax.lax.dynamic_update_slice(
                    store.k, kt[None], (li, 0, 0, input_pos, 0))
                cv = jax.lax.dynamic_update_slice(
                    store.v, vt[None], (li, 0, 0, input_pos, 0))
                if int8_cache:
                    cks = jax.lax.dynamic_update_slice(
                        store.ks, k_sc[None], (li, 0, 0, input_pos))
                    cvs = jax.lax.dynamic_update_slice(
                        store.vs, v_sc[None], (li, 0, 0, input_pos))
            else:
                ck = jax.lax.dynamic_update_slice(store.k, kt,
                                                  (0, 0, input_pos, 0))
                cv = jax.lax.dynamic_update_slice(store.v, vt,
                                                  (0, 0, input_pos, 0))
                if int8_cache:
                    cks = jax.lax.dynamic_update_slice(store.ks, k_sc,
                                                       (0, 0, input_pos))
                    cvs = jax.lax.dynamic_update_slice(store.vs, v_sc,
                                                       (0, 0, input_pos))
        else:
            # per-row write positions (continuous batching: slots decode at
            # different sequence offsets) — scatter along the seq axis; two
            # advanced indices around the head slice put (B, T) first, so the
            # value layout is exactly k/v's native (B, T, H_kv, D)
            rows = jnp.arange(b)[:, None]
            cols = input_pos[:, None] + jnp.arange(t)[None, :]
            val_k = kt.transpose(0, 2, 1, 3).astype(store.k.dtype)
            val_v = vt.transpose(0, 2, 1, 3).astype(store.v.dtype)
            if stacked and pos_major:
                ck = store.k.at[li, cols, rows].set(val_k)
                cv = store.v.at[li, cols, rows].set(val_v)
                if int8_cache:
                    # shard-blocked flat slots (tp_shards=1 degenerates to
                    # [b, pos*hkv + h]): [b, (h//hl)*S*hl + pos*hl + h%hl]
                    hkv_ = k_sc.shape[1]
                    hl = hkv_ // ad.tp_shards
                    span = store.ks.shape[2] // ad.tp_shards
                    h_idx = jnp.arange(hkv_)
                    fcols = (((h_idx // hl) * span + (h_idx % hl))[None, None]
                             + cols[:, :, None] * hl).reshape(b, -1)
                    cks = store.ks.at[li, rows, fcols].set(
                        k_sc.transpose(0, 2, 1).reshape(b, -1))
                    cvs = store.vs.at[li, rows, fcols].set(
                        v_sc.transpose(0, 2, 1).reshape(b, -1))
            elif stacked:
                ck = store.k.at[li, rows, :, cols].set(val_k)
                cv = store.v.at[li, rows, :, cols].set(val_v)
                if int8_cache:
                    cks = store.ks.at[li, rows, :, cols].set(
                        k_sc.transpose(0, 2, 1))
                    cvs = store.vs.at[li, rows, :, cols].set(
                        v_sc.transpose(0, 2, 1))
            else:
                ck = store.k.at[rows, :, cols].set(val_k)
                cv = store.v.at[rows, :, cols].set(val_v)
                if int8_cache:
                    cks = store.ks.at[rows, :, cols].set(
                        k_sc.transpose(0, 2, 1))
                    cvs = store.vs.at[rows, :, cols].set(
                        v_sc.transpose(0, 2, 1))
        if stacked:
            # read this layer's updated slice; the dynamic_slice fuses into
            # the attention einsums as an offset read (no copy)
            didx = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0,
                                                          keepdims=False)
            if pos_major and pallas_bounds is not None and t == 1:
                # the streaming kernel reads the full stacked buffers in
                # place — never materialize a transposed per-layer slice
                rk = rv = None
                rks = rvs = None
            elif pos_major:
                # prefill-only transposing read back to (B, Hkv, S, D) for
                # the einsum path (one materialized copy per layer; decode
                # never takes this branch)
                rk = didx(ck).transpose(1, 2, 0, 3)
                rv = didx(cv).transpose(1, 2, 0, 3)
                if int8_cache:
                    ss = ck.shape[1]
                    ns = ad.tp_shards  # shard-blocked flat (see write above)
                    unflat = lambda a: (didx(a).reshape(b, ns, ss, -1)
                                        .transpose(0, 1, 3, 2)
                                        .reshape(b, -1, ss))
                    rks, rvs = unflat(cks), unflat(cvs)
                else:
                    rks = rvs = None
            else:
                rk, rv = didx(ck), didx(cv)
                rks, rvs = ((didx(cks), didx(cvs)) if int8_cache
                            else (None, None))
        else:
            rk, rv = ck, cv
            rks, rvs = (cks, cvs) if int8_cache else (None, None)
        if int8_cache:
            new_full = KVCache(ck, cv, cks, cvs)
            if pallas_bounds is not None and t == 1 and not stacked:
                # the legacy per-layer Pallas kernel consumes dense bf16 k/v
                # (the stacked kernel below reads int8 + scales directly)
                k = rk.astype(x.dtype) * rks[..., None].astype(x.dtype)
                v = rv.astype(x.dtype) * rvs[..., None].astype(x.dtype)
            else:
                # dequant-free path: keep int8 k/v for the einsums and fold
                # the per-position scales into scores/probs instead —
                # (q · (k8·sc)) == (q · k8)·sc, so numerics match the
                # dequantized form up to f32 rounding, but the cache is read
                # once as int8 with no materialized bf16 copy (the
                # elementwise scale moves from O(S·D) onto O(S) terms)
                k, v = rk, rv
                k_scale, v_scale = rks, rvs
        else:
            new_full = KVCache(ck, cv)
            k, v = rk, rv
        new_cache = (StackedCacheView(new_full, li) if stacked else new_full)

    # GQA: group query heads over kv heads
    g = h // hkv
    qg = q.reshape(b, t, hkv, g, d)
    scale = 1.0 / math.sqrt(d)
    if pallas_bounds is not None and cache is not None and t == 1:
        lengths, starts = pallas_bounds
        if isinstance(cache, StackedCacheView):
            # read the layer's filled chunks of the full stacked cache in
            # place — no per-layer slice copy, no unfilled-position traffic
            nf = new_cache.full
            if ad.pallas_block_rows > 0 and (ad.pallas_stream
                                             or ad.kv_pos_major):
                # pos-major caches are only readable by the streaming kernel
                if ad.tp_shards > 1:
                    # sharded cache: run the kernel per-shard (heads over
                    # `model`, batch over `data`) via shard_map
                    from ..parallel.tp import stream_attention_tp

                    y = stream_attention_tp(
                        qg[:, 0], nf.k, nf.v, nf.ks, nf.vs, cache.layer,
                        lengths, starts, rows=ad.pallas_block_rows,
                        chunk=ad.pallas_chunk,
                        int8_scores=ad.pallas_int8_scores,
                        pos_major=ad.kv_pos_major, tp_shards=ad.tp_shards)
                else:
                    from ..ops.attention import (
                        pallas_decode_attention_stream,
                    )

                    if fold:
                        from ..ops.attention import (
                            pallas_decode_attention_stream_fold,
                        )

                        y, fk, fv, nks, nvs = \
                            pallas_decode_attention_stream_fold(
                                qg[:, 0], nf.k, nf.v, nf.ks, nf.vs,
                                cache.layer, lengths, starts,
                                fold_nk, fold_nv, input_pos,
                                rows=ad.pallas_block_rows,
                                chunk=ad.pallas_chunk,
                                int8_scores=ad.pallas_int8_scores)
                        # flat scales: minor offset pos*hkv is not
                        # 128-aligned, so the kernel returns them for this
                        # one XLA DUS (tp_shards == 1 here by the gate)
                        fks = jax.lax.dynamic_update_slice(
                            nf.ks, nks[None], (li, 0, input_pos * hkv))
                        fvs = jax.lax.dynamic_update_slice(
                            nf.vs, nvs[None], (li, 0, input_pos * hkv))
                        new_cache = StackedCacheView(
                            KVCache(fk, fv, fks, fvs), li)
                    else:
                        y = pallas_decode_attention_stream(
                            qg[:, 0], nf.k, nf.v, nf.ks, nf.vs, cache.layer,
                            lengths, starts, rows=ad.pallas_block_rows,
                            chunk=ad.pallas_chunk,
                            int8_scores=ad.pallas_int8_scores,
                            pos_major=ad.kv_pos_major)
            elif ad.pallas_block_rows > 0:
                if ad.tp_shards > 1:
                    from ..parallel.tp import blocks_attention_tp

                    y = blocks_attention_tp(
                        qg[:, 0], nf.k, nf.v, nf.ks, nf.vs, cache.layer,
                        lengths, starts, rows=ad.pallas_block_rows,
                        chunk=ad.pallas_chunk,
                        int8_scores=ad.pallas_int8_scores,
                        tp_shards=ad.tp_shards)
                else:
                    from ..ops.attention import (
                        pallas_decode_attention_blocks,
                    )

                    y = pallas_decode_attention_blocks(
                        qg[:, 0], nf.k, nf.v, nf.ks, nf.vs, cache.layer,
                        lengths, starts, rows=ad.pallas_block_rows,
                        chunk=ad.pallas_chunk,
                        int8_scores=ad.pallas_int8_scores)
            else:
                from ..ops.attention import (
                    pallas_decode_attention_stacked_rows,
                )

                assert ad.tp_shards == 1, (
                    "per-row kernel has no TP wrapper; use stream[N]")
                y = pallas_decode_attention_stacked_rows(
                    qg[:, 0], nf.k, nf.v, nf.ks, nf.vs, cache.layer,
                    lengths, starts)
        else:
            from ..ops.attention import pallas_decode_attention

            y = pallas_decode_attention(qg[:, 0], k, v, lengths, starts)
        y = y.reshape(b, 1, h * d)
        out = matmul_t(y, p["wo"], w8a8=ad.w8a8)
        if ad.o_bias:
            out = out + p["wo_b"]
        return out, new_cache
    if cache is not None and t == 1 and g > 1:
        # GQA decode-step formulation transposed to the CACHE's native layout:
        # contract with k/v as "bhkd" and keep S as the scores' penultimate
        # axis (the q-major "...->bhgqk" form makes XLA materialize a
        # layout-transposing copy of the per-layer cache slice before the
        # scores dot). A 128-slot-prefix lax.switch on the max filled length
        # was tried here to skip the unfilled cache suffix and MEASURED
        # SLOWER on v5e (233 -> 199 audio-s/s at 4B B=256: per-layer branch
        # overhead beats the traffic saved) — always read the full S extent.
        qd = qg[:, 0]                                     # (B, Hkv, G, D)
        mask_s = mask[:, :, -1, :, None]                  # (B or 1, 1, S, 1)

        def attend_prefix(si: int):
            ks_ = jax.lax.slice_in_dim(k, 0, si, axis=2)
            vv_ = jax.lax.slice_in_dim(v, 0, si, axis=2)
            m_ = jax.lax.slice_in_dim(mask_s, 0, si, axis=2)
            if k_scale is not None:
                ksc = jax.lax.slice_in_dim(k_scale, 0, si, axis=2)
                st = jnp.einsum("bhkd,bhgd->bhkg", ks_.astype(qd.dtype), qd)
                st = st.astype(jnp.float32) * (
                    ksc[..., None].astype(jnp.float32) * scale)
            else:
                st = jnp.einsum("bhkd,bhgd->bhkg", ks_, qd)
                st = st.astype(jnp.float32) * scale
            st = jnp.where(m_, st, jnp.float32(-1e30))
            pt = jax.nn.softmax(st, axis=2)
            if v_scale is not None:
                vsc = jax.lax.slice_in_dim(v_scale, 0, si, axis=2)
                pt = pt * vsc[..., None].astype(jnp.float32)
            return jnp.einsum(
                "bhkg,bhkd->bhgd", pt.astype(x.dtype),
                vv_.astype(x.dtype) if vv_.dtype == jnp.int8 else vv_)

        y = attend_prefix(k.shape[2])
        y = y.reshape(b, 1, h * d)
        out = matmul_t(y, p["wo"], w8a8=ad.w8a8)
        if ad.o_bias:
            out = out + p["wo_b"]
        return out, new_cache
    # NOTE a static [0, bucket_len) prefix slice here (python-unrolled fast
    # sweeps) was tried and MEASURED SLOWER on v5e (243 -> 227 audio-s/s at
    # 4B B=256): odd-sized sublane slices force relayouts that cost more
    # than the skipped tail of a K=10 cache. Attention reads the full extent.
    if cache is not None and k_scale is not None:
        scores = jnp.einsum("bqhgd,bhkd->bhgqk", qg, k.astype(qg.dtype))
        scores = scores.astype(jnp.float32) * (
            k_scale[:, :, None, None, :].astype(jnp.float32) * scale)
    elif cache is not None:
        scores = jnp.einsum("bqhgd,bhkd->bhgqk", qg, k) * scale
    else:
        scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k) * scale
    # large-finite mask value (not -inf): fully-masked pad rows must stay
    # finite, else NaN k/v written at pad cache slots poison `0 * NaN` later
    scores = jnp.where(mask[:, :, None, :, :],
                       scores.astype(jnp.float32), jnp.float32(-1e30))
    probs_f = jax.nn.softmax(scores, axis=-1)
    if cache is not None and v_scale is not None:
        pv = (probs_f * v_scale[:, :, None, None, :].astype(jnp.float32)
              ).astype(x.dtype)
        y = jnp.einsum("bhgqk,bhkd->bqhgd", pv, v.astype(x.dtype))
    elif cache is not None:
        y = jnp.einsum("bhgqk,bhkd->bqhgd", probs_f.astype(x.dtype), v)
    else:
        y = jnp.einsum("bhgqk,bkhd->bqhgd", probs_f.astype(x.dtype), v)
    y = y.reshape(b, t, h * d)
    out = matmul_t(y, p["wo"], w8a8=ad.w8a8)
    if ad.o_bias:
        out = out + p["wo_b"]
    return out, new_cache


def _ffn(p: dict, x: jax.Array, w8a8: bool = False) -> jax.Array:
    gate = jax.nn.silu(matmul_t(x, p["w1"], w8a8=w8a8))
    return matmul_t(gate * matmul_t(x, p["w3"], w8a8=w8a8), p["w2"],
                    w8a8=w8a8)


def _block(p: dict, ad: AttnDims, eps: float, x: jax.Array, freqs_cis, mask,
           cache=None, input_pos=None, pallas_bounds=None):
    a, new_cache = attention(p["attention"], ad,
                             rms_norm(x, p["attention_norm"], eps),
                             freqs_cis, mask, cache, input_pos, pallas_bounds)
    h = x + a
    out = h + _ffn(p["feed_forward"], rms_norm(h, p["ffn_norm"], eps),
                   w8a8=ad.w8a8)
    return out, new_cache


def run_stack(layers: dict, ad: AttnDims, eps: float, x: jax.Array, freqs_cis,
              mask, cache: KVCache | None = None, input_pos: jax.Array | None = None,
              remat: bool = False, unroll: int = 1, unrolled: bool = False,
              pallas_bounds: tuple | None = None, mode: str = ""):
    """Scan the stacked layer params over depth. Returns (x, new_cache).

    `unroll` trades compile time for schedule quality: unrolled layers let XLA
    overlap the next layer's weight prefetch with the current layer's compute
    (decode is weight-bandwidth-bound).

    Cached-decode stack modes (`mode`, falling back to `unrolled` flag):
      carry    — cache carried through the scan, updated in place at a
                 dynamic layer index (no double-buffering, fast compile)
      unrolled — python layer loop, static per-layer in-place updates
      scan     — cache as scan xs/ys (double-buffers the full cache)
    """
    if cache is None:
        def step(h, layer_p):
            out, _ = _block(layer_p, ad, eps, h, freqs_cis, mask)
            return out, None
        if remat:
            step = jax.checkpoint(step)
        x, _ = jax.lax.scan(step, x, layers, unroll=unroll)
        return x, None

    # carry is the measured-best default on TPU for every dtype/batch tried
    # (4B int8-weights: B=64 bf16-KV 85.9 vs 61 unrolled audio-s/s; int8-KV
    # B=256 161.5 vs scan OOM); `unrolled`/`scan` remain selectable
    mode = mode or "carry"
    if mode == "unrolled" and cache.k.dtype == jnp.int8:
        # measured on v5e: the unrolled per-layer dynamic_update_index chain
        # on int8 buffers explodes XLA compile time (2-layer micro-benchmark:
        # 106s vs 1s via scan; the 4B program never finishes)
        mode = "carry"

    if mode == "carry":
        def step(carry, layer_p):
            h, c, i = carry
            out, view = _block(layer_p, ad, eps, h, freqs_cis, mask,
                               StackedCacheView(c, i), input_pos,
                               pallas_bounds)
            return (out, view.full, i + 1), None

        (x, cache, _), _ = jax.lax.scan(
            step, (x, cache, jnp.int32(0)), layers, unroll=unroll)
        return x, cache

    if mode == "unrolled":
        # python-unrolled layer loop: each layer's cache slice is updated with
        # a static-index dynamic_update_slice on the SAME buffer, which XLA
        # aliases in place — the scan path below materializes a second full
        # cache (xs + ys), doubling KV memory at large batch.
        acc = cache
        n_layer = jax.tree.leaves(layers)[0].shape[0]
        for i in range(n_layer):
            layer_p = jax.tree.map(lambda a: a[i], layers)
            layer_cache = jax.tree.map(lambda a: a[i], acc)
            x, new_lc = _block(layer_p, ad, eps, x, freqs_cis, mask,
                               layer_cache, input_pos, pallas_bounds)
            acc = jax.tree.map(
                lambda full, lc: jax.lax.dynamic_update_index_in_dim(
                    full, lc, i, 0), acc, new_lc)
        return x, acc

    def step(h, xs):
        layer_p, layer_cache = xs
        out, new_lc = _block(layer_p, ad, eps, h, freqs_cis, mask, layer_cache,
                             input_pos, pallas_bounds)
        return out, new_lc

    x, new_cache = jax.lax.scan(step, x, (layers, cache), unroll=unroll)
    return x, new_cache


# ---------------------------------------------------------------------------
# Embedding of (K+1)-row token matrices (ref llama.py:326-345, 399-420)
# ---------------------------------------------------------------------------


def embed_tokens(params: dict, cfg: DualARConfig, inp: jax.Array) -> jax.Array:
    """inp: (B, K+1, T) int32 -> (B, T, D)."""
    emb_dtype = param_dtype(params)
    codes = inp[:, 1:, :]  # (B, K, T)
    offsets = (jnp.arange(cfg.num_codebooks, dtype=inp.dtype) * cfg.codebook_size)
    idx = codes + offsets[None, :, None]
    vq_embeds = take_rows(params["codebook_embeddings"], idx)  # (B,K,T,D)
    vq_sum = jnp.sum(vq_embeds, axis=1).astype(emb_dtype)  # (B, T, D)

    tok = inp[:, 0, :]
    is_semantic = (tok >= cfg.semantic_begin_id) & (tok <= cfg.semantic_end_id)
    vq_sum = jnp.where(is_semantic[..., None], vq_sum, jnp.zeros((), emb_dtype))

    x = take_rows(params["embeddings"], tok).astype(emb_dtype) + vq_sum
    if cfg.scale_codebook_embeddings:
        scale = 1.0 / math.sqrt(cfg.num_codebooks + 1)
        x = jnp.where(is_semantic[..., None], x * jnp.asarray(scale, emb_dtype), x)
    return x


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


class SlowOut(NamedTuple):
    logits: jax.Array         # (B, Tq, vocab)
    hidden: jax.Array         # (B, Tq, fast_dim) — already fast_project_in'ed
    cache: KVCache | None


def _token_logits(params: dict, cfg: DualARConfig, slow_out: jax.Array,
                  logit_support: tuple | None = None) -> jax.Array:
    w = (params["embeddings"] if cfg.tie_word_embeddings
         else params["output"])
    if logit_support is not None:
        # constrained decoding only ever samples inside
        # [semantic_begin, semantic_end] + {im_end} (the additive bias is
        # -inf everywhere else, ref inference.py:308-320), so compute logits
        # over just those rows: (n_s+1) instead of V projections per step.
        # Softmax/top-k over this support is bit-identical to the full-vocab
        # biased computation (exp(-inf) == 0 exactly).
        from ..ops.quant import slice_rows

        sb, se, im = logit_support
        sem = slow_out @ as_weight(slice_rows(w, sb, se + 1),
                                   slow_out.dtype).T
        eos = slow_out @ as_weight(slice_rows(w, im, im + 1),
                                   slow_out.dtype).T
        return jnp.concatenate([sem, eos], axis=-1)  # (..., n_s + 1)
    return slow_out @ as_weight(w, slow_out.dtype).T


def _fast_input(params: dict, cfg: DualARConfig, x: jax.Array,
                slow_normed: jax.Array) -> jax.Array:
    h = slow_normed if cfg.norm_fastlayer_input else x
    if "fast_project_in" in params:
        h = h @ params["fast_project_in"]["w"].T + params["fast_project_in"]["b"]
    return h


def forward_generate(params: dict, cfg: DualARConfig, inp: jax.Array,
                     cache: KVCache, input_pos: jax.Array,
                     freqs_table: jax.Array, *, last_only: bool = True,
                     rope_positions: jax.Array | None = None,
                     key_valid_from: jax.Array | None = None,
                     logit_support: tuple | None = None) -> SlowOut:
    """Slow-stack forward with KV cache (prefill T>=1 or decode T=1).

    input_pos: scalar int32 — first cache slot written by `inp`.
    rope_positions: optional (B, T) per-row RoPE positions (left-padded
    batching); defaults to input_pos + arange(T).
    key_valid_from: optional (B,) — keys before this slot are masked out
    (left-pad exclusion).
    Mirrors ref llama.py:390-466 + DualAR fast_project_in at 818-827.
    """
    b, _, t = inp.shape
    x = embed_tokens(params, cfg, inp)
    positions = jnp.asarray(input_pos)[..., None] + jnp.arange(t, dtype=jnp.int32)
    if rope_positions is None:
        freqs_cis = jnp.take(freqs_table, positions, axis=0)
    else:
        freqs_cis = jnp.take(freqs_table, rope_positions, axis=0)  # (B,T,·,2)
    s = cache.k.shape[1 if cfg.kv_cache_layout == "pos" else 3]
    key_pos = jnp.arange(s, dtype=jnp.int32)
    if positions.ndim == 1:  # scalar input_pos: shared positions
        mask = (key_pos[None, :] <= positions[:, None])[None, None]  # (1,1,T,S)
    else:  # per-row input_pos: (B, T, S) causal mask
        mask = (key_pos[None, None, :] <= positions[:, :, None])[:, None]
    if key_valid_from is not None:
        valid = key_pos[None, :] >= key_valid_from[:, None]      # (B,S)
        mask = mask & valid[:, None, None, :]

    pallas_bounds = None
    if cfg.use_pallas_attention and t == 1:
        lengths = positions[..., -1].reshape(-1) + 1
        if lengths.shape[0] != b:
            lengths = jnp.broadcast_to(lengths, (b,))
        starts = (key_valid_from if key_valid_from is not None
                  else jnp.zeros((b,), jnp.int32))
        pallas_bounds = (lengths, starts)
    x, cache = run_stack(params["layers"], cfg.slow_attn, cfg.norm_eps, x,
                         freqs_cis, mask, cache, input_pos,
                         unroll=cfg.scan_unroll, unrolled=cfg.unrolled_decode,
                         pallas_bounds=pallas_bounds,
                         mode=cfg.decode_stack_mode)
    if last_only and t > 1:
        x = x[:, -1:, :]
    slow_normed = rms_norm(x, params["norm"], cfg.norm_eps)
    logits = _token_logits(params, cfg, slow_normed, logit_support)
    hidden = _fast_input(params, cfg, x, slow_normed)
    return SlowOut(logits=logits, hidden=hidden, cache=cache)


def forward_generate_fast(params: dict, cfg: DualARConfig, x: jax.Array,
                          fast_cache: KVCache, input_pos, fast_freqs_table:
                          jax.Array, want_logits: bool = True):
    """One fast-head step at codebook position `input_pos` (ref llama.py:798-816).
    x: (B, fast_dim). Returns (codebook_logits (B, codebook_size), new_cache).

    input_pos may be a PYTHON int (unrolled sweeps): the RoPE row and causal
    mask become compile-time constants. want_logits=False skips the
    fast_output projection (the priming sweep only needs its cache write)."""
    if "fast_packed" in params:
        # fused Pallas sweep (ops/fast_fused.py): whole stack in one kernel,
        # W8A8 dots, int8 position-major cache. Static positions only.
        # Batch pads to a multiple of 8: Mosaic's int8 (8,128)(4,1) tiling
        # rejects smaller cache-row DMAs (the cache is created pre-padded by
        # decode_one_token; single-stream latency serving hits this).
        assert isinstance(input_pos, int), (
            "fused fast head needs unroll_fast_sweeps (static positions)")
        b = x.shape[0]
        b8 = fast_cache.k.shape[2]
        if b8 != b:
            x = jnp.pad(x, ((0, b8 - b), (0, 0)))
        if cfg.tp_shards > 1:
            # multi-chip: batch-split the sweep over the whole mesh with
            # replicated weights (parallel/tp.py)
            from ..parallel.tp import fused_fast_sweep_tp, get_decode_mesh

            # the priming sweep's x is the slow-stack hidden, sharded
            # (batch@data, dim@model); the sweep wants batch@(data,model).
            # GSPMD cannot reshard {d,m}->{d*m,1} directly (it falls back to
            # "involuntary full rematerialization" = replicate+slice, an
            # all-gather of the whole activation every decode step). Stage
            # it explicitly: gather dim over model (the only real
            # collective), then the batch split is a free local slice.
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

            mesh = get_decode_mesh()
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, _P(DATA_AXIS, None)))
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, _P((DATA_AXIS, MODEL_AXIS), None)))
            x, fast_cache = fused_fast_sweep_tp(
                params["fast_packed"], x, fast_cache, fast_freqs_table,
                pos=input_pos, n_head=cfg.fast_n_head, eps=cfg.norm_eps,
                tp_shards=cfg.tp_shards)
        else:
            from ..ops.fast_fused import fused_fast_sweep

            x, fast_cache = fused_fast_sweep(
                params["fast_packed"], x, fast_cache, fast_freqs_table,
                pos=input_pos, n_head=cfg.fast_n_head, eps=cfg.norm_eps)
        if not want_logits:
            return None, fast_cache
        x = rms_norm(x[:b], params["fast_norm"], cfg.norm_eps)
        return matmul_t(x, params["fast_output"], w8a8=True), fast_cache

    x = x[:, None, :]  # (B, 1, D)
    if isinstance(input_pos, int):
        freqs_cis = fast_freqs_table[input_pos:input_pos + 1]
    else:
        freqs_cis = jax.lax.dynamic_slice_in_dim(fast_freqs_table, input_pos,
                                                 1, axis=0)
    key_pos = jnp.arange(cfg.num_codebooks, dtype=jnp.int32)
    mask = (key_pos <= input_pos)[None, None, None]  # (1,1,1,K)
    # fast stack stays scanned: measured slightly faster than unrolled and
    # far cheaper to compile (its KV cache is tiny, so the scan's
    # double-buffering doesn't matter here)
    x, fast_cache = run_stack(params["fast_layers"], cfg.fast_attn, cfg.norm_eps,
                              x, freqs_cis, mask, fast_cache, input_pos,
                              unroll=cfg.fast_scan_unroll)
    if not want_logits:
        return None, fast_cache
    x = rms_norm(x, params["fast_norm"], cfg.norm_eps)
    logits = matmul_t(x[:, 0, :], params["fast_output"],
                      w8a8=cfg.w8a8_matmuls)
    return logits, fast_cache


class TrainOut(NamedTuple):
    token_logits: jax.Array      # (B, T, vocab)
    codebook_logits: jax.Array   # (B, T, K, codebook_size)


def forward_train(params: dict, cfg: DualARConfig, inp: jax.Array,
                  labels: jax.Array | None = None,
                  key_padding_mask: jax.Array | None = None,
                  remat: bool = True) -> TrainOut:
    """Teacher-forced forward for training (ref llama.py:723-796).

    TPU-first deviation: the reference gathers hidden states at semantic
    positions (data-dependent shape, llama.py:752-779); we instead run the
    fast head over *every* position with static shapes and let the loss mask
    select semantic positions — on speech data most positions are semantic, so
    the extra FLOPs are small and XLA keeps one fused program.

    labels: (B, K+1, T) used for teacher-forcing fast-head inputs; defaults to
    `inp` codes when None. Codebook k>=1 conditions on codes[..., :k].
    """
    b, _, t = inp.shape
    x = embed_tokens(params, cfg, inp)
    freqs_cis = precompute_freqs_cis(t, cfg.head_dim, cfg.rope_base)
    q_pos = jnp.arange(t)
    causal = (q_pos[None, :] <= q_pos[:, None])[None, None]  # (1,1,T,T)
    if key_padding_mask is not None:
        # key_padding_mask: (B, T) True at PAD positions (ref llama.py:360-366)
        mask = causal & (~key_padding_mask)[:, None, None, :]
    else:
        mask = jnp.broadcast_to(causal, (b, 1, t, t))

    x, _ = run_stack(params["layers"], cfg.slow_attn, cfg.norm_eps, x,
                     freqs_cis, mask, remat=remat)
    slow_normed = rms_norm(x, params["norm"], cfg.norm_eps)
    token_logits = _token_logits(params, cfg, slow_normed)

    if cfg.is_naive:
        # parallel codebook head (ref NaiveTransformer.decode, llama.py:626-639)
        h = slow_normed if cfg.norm_fastlayer_input else x
        cb = rms_norm(h, params["codebook_norm"], cfg.norm_eps)
        cb_logits = cb @ as_weight(params["codebook_output"], cb.dtype).T
        codebook_logits = cb_logits.reshape(b, t, cfg.num_codebooks,
                                            cfg.codebook_size)
        return TrainOut(token_logits=token_logits,
                        codebook_logits=codebook_logits)

    h = _fast_input(params, cfg, x, slow_normed)  # (B, T, fast_dim)

    # Fast stack over all positions: fold T into batch.
    src = labels if labels is not None else inp
    codes = jnp.clip(src[:, 1:, :], 0, cfg.codebook_size - 1)  # (B, K, T)
    code_emb = take_rows(params["fast_embeddings"], codes[:, :-1, :])
    # fast input sequence: [h, emb(c_0), ..., emb(c_{K-2})]  (ref llama.py:777-779)
    fast_in = jnp.concatenate([h[:, None, :, :],
                               code_emb.astype(h.dtype)], axis=1)  # (B,K,T,Df)
    fast_in = fast_in.transpose(0, 2, 1, 3).reshape(b * t, cfg.num_codebooks, -1)

    k = cfg.num_codebooks
    fast_freqs = precompute_freqs_cis(k, cfg.fast_head_dim, cfg.rope_base)
    kq = jnp.arange(k)
    fmask = (kq[None, :] <= kq[:, None])[None, None]
    fx, _ = run_stack(params["fast_layers"], cfg.fast_attn, cfg.norm_eps,
                      fast_in, fast_freqs, fmask, remat=remat)
    fx = rms_norm(fx, params["fast_norm"], cfg.norm_eps)
    codebook_logits = fx @ as_weight(params["fast_output"], fx.dtype).T  # (B*T, K, cbs)
    codebook_logits = codebook_logits.reshape(b, t, k, cfg.codebook_size)
    return TrainOut(token_logits=token_logits, codebook_logits=codebook_logits)
