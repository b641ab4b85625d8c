"""Standalone compile-time probes for int8-KV attention formulations inside a
layer scan (reproduces the 14x compile blowup seen in decode_one_token with
kv_cache_dtype=int8; tiny model: bf16 6s vs int8 82s).

Usage: python tools/probe_int8_scan.py <variant>   (run under `timeout`)
  bf16        control: bf16 cache scan
  int8_full   current production formulation: dequantize whole cache -> einsum
  int8_scores dequant-free: scores = (q @ k8) * ksc ; out = (probs*vsc) @ v8
  int8_unroll int8_full but python-unrolled layers (no scan)
  int8_bf16sc int8_full with bf16 scales
Prints compile+run seconds.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

L, B, H, S, D = 2, 4, 2, 128, 64


def quant(kt):
    sc = jnp.maximum(jnp.max(jnp.abs(kt.astype(jnp.float32)), axis=-1) / 127.0,
                     1e-8)
    q = jnp.round(kt.astype(jnp.float32) / sc[..., None]).astype(jnp.int8)
    return q, sc


def attn_core(q, k, v):  # q: (B,H,1,D) bf16; k,v: (B,H,S,D) bf16
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v)


def main(variant):
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, H, 1, D), jnp.bfloat16)
    pos = jnp.int32(17)
    sc_dtype = jnp.bfloat16 if variant == "int8_bf16sc" else jnp.float32

    if variant == "bf16":
        cache = (jnp.zeros((L, B, H, S, D), jnp.bfloat16),) * 2

        def layer(h, lc):
            ck = jax.lax.dynamic_update_slice(lc[0], h, (0, 0, pos, 0))
            cv = jax.lax.dynamic_update_slice(lc[1], h, (0, 0, pos, 0))
            return attn_core(h, ck, cv), (ck, cv)
    else:
        cache = (jnp.zeros((L, B, H, S, D), jnp.int8),
                 jnp.zeros((L, B, H, S, D), jnp.int8),
                 jnp.zeros((L, B, H, S), sc_dtype),
                 jnp.zeros((L, B, H, S), sc_dtype))

        def layer(h, lc):
            k8, ksc = quant(h)
            v8, vsc = quant(h * 0.5)
            ck = jax.lax.dynamic_update_slice(lc[0], k8, (0, 0, pos, 0))
            cv = jax.lax.dynamic_update_slice(lc[1], v8, (0, 0, pos, 0))
            cks = jax.lax.dynamic_update_slice(lc[2], ksc.astype(sc_dtype),
                                               (0, 0, pos))
            cvs = jax.lax.dynamic_update_slice(lc[3], vsc.astype(sc_dtype),
                                               (0, 0, pos))
            if variant == "int8_scores":
                scores = jnp.einsum("bhtd,bhsd->bhts", h,
                                    ck.astype(jnp.bfloat16))
                scores = (scores.astype(jnp.float32)
                          * cks[:, :, None, :].astype(jnp.float32))
                probs = jax.nn.softmax(scores, axis=-1)
                pv = (probs * cvs[:, :, None, :].astype(jnp.float32)
                      ).astype(jnp.bfloat16)
                out = jnp.einsum("bhts,bhsd->bhtd", pv,
                                 cv.astype(jnp.bfloat16))
            else:
                k = ck.astype(jnp.bfloat16) * cks[..., None].astype(jnp.bfloat16)
                v = cv.astype(jnp.bfloat16) * cvs[..., None].astype(jnp.bfloat16)
                out = attn_core(h, k, v)
            return out, (ck, cv, cks, cvs)

    if variant == "int8_unroll":
        @partial(jax.jit, donate_argnums=(1,))
        def f(h, cache):
            acc = cache
            for i in range(L):
                lc = jax.tree.map(lambda a: a[i], acc)
                h, nlc = layer(h, lc)
                acc = tuple(
                    jax.lax.dynamic_update_index_in_dim(full, p, i, 0)
                    for full, p in zip(acc, nlc))
            return h, acc
    else:
        @partial(jax.jit, donate_argnums=(1,))
        def f(h, cache):
            def step(h, lc):
                return layer(h, lc)
            return jax.lax.scan(step, h, cache)

    t0 = time.perf_counter()
    out = jax.block_until_ready(f(x, cache))
    print(f"OK {variant}: compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
