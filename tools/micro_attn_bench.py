"""Micro-benchmark of the decode-attention paths at 4B serving shapes.

Compares, per 36-layer sweep (one jitted fori_loop over layers, N reps):
  einsum   — dynamic_index_in_dim at the layer + dequant-free int8 einsums
             (the current carry-mode default in models/dual_ar.py)
  stacked  — per-(b,h)-grid Pallas kernel (ops/attention.py, known slow)
  rows     — row-batched Pallas kernel (grid (B,), head-batched DMA + one
             block-diagonal dot)

Usage: python tools/micro_attn_bench.py [--batch 256] [--cache 384]
       [--fill 224] [--kv int8|bf16] [--paths einsum,rows]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fish_speech_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cache", type=int, default=384)
    ap.add_argument("--fill", type=int, default=224)
    ap.add_argument("--layers", type=int, default=36)
    ap.add_argument("--kv", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--paths", default="einsum,rows")
    args = ap.parse_args()

    L, B, Hkv, G, D, S = (args.layers, args.batch, 8, 4, 128, args.cache)
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Hkv, G, D), jnp.bfloat16)
    int8 = args.kv == "int8"
    if int8:
        # random.bits: no int32 intermediates (randint would materialize 4x)
        kf = jax.random.bits(kk, (L, B, Hkv, S, D), jnp.uint8).astype(jnp.int8)
        vf = jax.random.bits(kv, (L, B, Hkv, S, D), jnp.uint8).astype(jnp.int8)
        ks = jax.random.uniform(kk, (L, B, Hkv, S), jnp.float32, 0.001, 0.02)
        vs = jax.random.uniform(kv, (L, B, Hkv, S), jnp.float32, 0.001, 0.02)
    else:
        kf = jax.random.normal(kk, (L, B, Hkv, S, D), jnp.bfloat16)
        vf = jax.random.normal(kv, (L, B, Hkv, S, D), jnp.bfloat16)
        ks = vs = None
    lengths = jnp.full((B,), args.fill, jnp.int32)
    starts = jnp.zeros((B,), jnp.int32)

    def einsum_layer(li):
        didx = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
        k, v = didx(kf), didx(vf)
        scale = 1.0 / (D ** 0.5)
        if int8:
            rks, rvs = didx(ks), didx(vs)
            scores = jnp.einsum("bhgd,bhkd->bhgk", q, k.astype(q.dtype))
            scores = scores.astype(jnp.float32) * (
                rks[:, :, None, :].astype(jnp.float32) * scale)
        else:
            scores = jnp.einsum("bhgd,bhkd->bhgk", q, k) * scale
        pos = jnp.arange(S, dtype=jnp.int32)
        valid = (pos[None, :] < lengths[:, None]) & (pos[None, :] >= starts[:, None])
        scores = jnp.where(valid[:, None, None, :], scores.astype(jnp.float32),
                           jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1)
        if int8:
            pv = (probs * rvs[:, :, None, :].astype(jnp.float32)).astype(q.dtype)
            return jnp.einsum("bhgk,bhkd->bhgd", pv, v.astype(q.dtype))
        return jnp.einsum("bhgk,bhkd->bhgd", probs.astype(q.dtype), v)

    # same cache stored as (L, B, S, Hkv, D): the memory order the einsum
    # path's transposing copy produces — if XLA reads it in place, the
    # 4.8 ms/step copy disappears. Generated only when requested (holding
    # both layouts OOMs the chip), with the same values reshaped is not
    # needed — this is a bandwidth benchmark.
    if "einsum_bshd" in args.paths:
        if int8:
            kf2 = jax.random.bits(kk, (L, B, S, Hkv, D), jnp.uint8).astype(jnp.int8)
            vf2 = jax.random.bits(kv, (L, B, S, Hkv, D), jnp.uint8).astype(jnp.int8)
            ks2 = jax.random.uniform(kk, (L, B, S, Hkv), jnp.float32, 0.001, 0.02)
            vs2 = jax.random.uniform(kv, (L, B, S, Hkv), jnp.float32, 0.001, 0.02)
        else:
            kf2 = jax.random.normal(kk, (L, B, S, Hkv, D), jnp.bfloat16)
            vf2 = jax.random.normal(kv, (L, B, S, Hkv, D), jnp.bfloat16)
            ks2 = vs2 = None
        if args.paths == "einsum_bshd":
            del kf, vf
            kf = vf = None

    def einsum_bshd_layer(li):
        didx = lambda a: jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
        k, v = didx(kf2), didx(vf2)                      # (B, S, Hkv, D)
        scale = 1.0 / (D ** 0.5)
        if int8:
            rks, rvs = didx(ks2), didx(vs2)              # (B, S, Hkv)
            st = jnp.einsum("bkhd,bhgd->bhkg", k.astype(q.dtype), q)
            st = st.astype(jnp.float32) * (
                rks.transpose(0, 2, 1)[..., None].astype(jnp.float32) * scale)
        else:
            st = jnp.einsum("bkhd,bhgd->bhkg", k, q).astype(jnp.float32) * scale
        pos = jnp.arange(S, dtype=jnp.int32)
        valid = ((pos[None, :] < lengths[:, None])
                 & (pos[None, :] >= starts[:, None]))
        st = jnp.where(valid[:, None, :, None], st, jnp.float32(-1e30))
        pt = jax.nn.softmax(st, axis=2)
        if int8:
            pt = pt * rvs.transpose(0, 2, 1)[..., None].astype(jnp.float32)
        return jnp.einsum("bhkg,bkhd->bhgd", pt.astype(q.dtype),
                          v.astype(q.dtype) if int8 else v)

    def kernel_layer(fn, li):
        return fn(q, kf, vf, ks, vs, li, lengths, starts)

    from fish_speech_tpu.ops.attention import (
        pallas_decode_attention_stacked,
        pallas_decode_attention_stacked_rows,
    )

    paths = {
        "einsum": einsum_layer,
        "einsum_bshd": einsum_bshd_layer,
        "stacked": partial(kernel_layer, pallas_decode_attention_stacked),
        "rows": partial(kernel_layer, pallas_decode_attention_stacked_rows),
    }

    for name in args.paths.split(","):
        layer_fn = paths[name]

        @jax.jit
        def sweep(_q):
            def body(li, acc):
                return acc + layer_fn(li).astype(jnp.float32)
            return jax.lax.fori_loop(0, L, body,
                                     jnp.zeros((B, Hkv, G, D), jnp.float32))

        t0 = time.perf_counter()
        out = sweep(q)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = sweep(q)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        filled = args.fill * B * Hkv * D * 2 * L * (1 if int8 else 2)
        bw = filled / (dt / 1e3) / 1e9
        print(f"{name:8s} {dt:8.3f} ms/sweep  ({L} layers, B={B}, S={S}, "
              f"fill={args.fill}, kv={args.kv})  filled-bytes BW {bw:.0f} GB/s "
              f"[compile {compile_s:.1f}s]")


if __name__ == "__main__":
    main()
