"""Isolate which op wedges the TPU compiler in the int8 KV-cache path.

Usage: python tools/probe_int8_kv.py <case>   (run each under `timeout`!)
Cases build ONE tiny jitted program exercising a single suspect op from
fish_speech_tpu/models/dual_ar.py attention() int8 branch. A case that hangs
in compilation identifies the culprit. Run sequentially; check tunnel health
with case `health` between runs.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

# NO persistent cache: we want to observe compile behavior, and a poisoned
# cache entry would confuse later runs.

L, B, H, S, D, T = 2, 4, 2, 128, 64, 1


def report(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"OK {name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    return out


def main(case):
    k8 = jnp.zeros((B, H, S, D), jnp.int8)
    sc = jnp.zeros((B, H, S), jnp.float32)
    new_bf = jnp.ones((B, H, T, D), jnp.bfloat16)
    pos = jnp.int32(17)
    rows = jnp.arange(B)[:, None]
    cols = jnp.full((B, 1), 17, jnp.int32) + jnp.arange(T)[None, :]

    if case == "health":
        report("health", lambda x: (x @ x.T).sum(), jnp.ones((128, 128)))
    elif case == "dus_int8":
        def f(c, n, p):
            q = jnp.clip(jnp.round(n.astype(jnp.float32)), -127, 127
                         ).astype(jnp.int8)
            return jax.lax.dynamic_update_slice(c, q, (0, 0, p, 0))
        report(case, f, k8, new_bf, pos)
    elif case == "scatter_int8":
        def f(c, n, cols):
            q = jnp.clip(jnp.round(n.astype(jnp.float32)), -127, 127
                         ).astype(jnp.int8)
            return c.at[rows, :, cols].set(q.transpose(0, 2, 1, 3))
        report(case, f, k8, new_bf, cols)
    elif case == "scatter_scale":
        def f(s, n, cols):
            v = jnp.max(jnp.abs(n.astype(jnp.float32)), axis=-1) / 127.0
            return s.at[rows, :, cols].set(v.transpose(0, 2, 1))
        report(case, f, sc, new_bf, cols)
    elif case == "dequant_mm":
        q = jnp.ones((B, H, T, D), jnp.bfloat16)
        def f(c, s, q):
            kd = c.astype(jnp.bfloat16) * s[..., None].astype(jnp.bfloat16)
            return jnp.einsum("bhtd,bhsd->bhts", q, kd)
        report(case, f, k8, sc, q)
    elif case == "full_attn":
        from fish_speech_tpu.models.dual_ar import AttnDims, KVCache, attention, precompute_freqs_cis
        dim = H * D
        ad = AttnDims(n_head=H, n_local_heads=H, head_dim=D, dim=dim,
                      qkv_bias=False, o_bias=False, qk_norm=False)
        p = {"wqkv": jnp.ones(((2 * H + H) * D, dim), jnp.bfloat16) * 0.01,
             "wo": jnp.ones((dim, dim), jnp.bfloat16) * 0.01}
        cache = KVCache(jnp.zeros((B, H, S, D), jnp.int8),
                        jnp.zeros((B, H, S, D), jnp.int8), sc, sc)
        x = jnp.ones((B, T, dim), jnp.bfloat16)
        freqs = precompute_freqs_cis(S, D, 10000.0)[17:18]
        mask = jnp.ones((1, 1, T, S), bool)
        def f(p, x, cache, pos):
            return attention(p, ad, x, freqs, mask, cache, pos)
        report(case, f, p, x, cache, pos)
    elif case == "fori_int8":
        # the bench/while_loop wrapper: donated int8 carry through fori_loop
        def step(c, n, p):
            q = jnp.clip(jnp.round(n.astype(jnp.float32)), -127, 127
                         ).astype(jnp.int8)
            return jax.lax.dynamic_update_slice(c, q, (0, 0, p, 0))
        def f(c, n):
            return jax.lax.fori_loop(
                0, 4, lambda i, c: step(c, n, jnp.int32(i)), c)
        report(case, f, k8, new_bf)
    else:
        raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main(sys.argv[1])
