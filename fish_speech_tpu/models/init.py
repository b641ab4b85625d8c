"""Random init + torch-checkpoint conversion for the Dual-AR transformer.

Conversion consumes the reference state-dict naming
(/root/reference/fish_speech/models/text2semantic/llama.py:249-705), stacking
per-layer tensors along a leading depth axis for `lax.scan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import AttnDims, DualARConfig


def _init_stack(key, cfg: DualARConfig, ad: AttnDims, n_layer: int,
                inter: int, std: float, dtype) -> dict:
    ks = jax.random.split(key, 8)
    qkv_dim = (ad.n_head + 2 * ad.n_local_heads) * ad.head_dim

    def w(k, shape):
        return (jax.random.truncated_normal(k, -2, 2, (n_layer, *shape), jnp.float32)
                * std).astype(dtype)

    layers = {
        "attention": {
            "wqkv": w(ks[0], (qkv_dim, ad.dim)),
            "wo": w(ks[1], (ad.dim, ad.n_head * ad.head_dim)),
        },
        "feed_forward": {
            "w1": w(ks[2], (inter, ad.dim)),
            "w2": w(ks[3], (ad.dim, inter)),
            "w3": w(ks[4], (inter, ad.dim)),
        },
        "attention_norm": jnp.ones((n_layer, ad.dim), dtype),
        "ffn_norm": jnp.ones((n_layer, ad.dim), dtype),
    }
    if ad.qkv_bias:
        layers["attention"]["wqkv_b"] = jnp.zeros((n_layer, qkv_dim), dtype)
    if ad.o_bias:
        layers["attention"]["wo_b"] = jnp.zeros((n_layer, ad.dim), dtype)
    if ad.qk_norm:
        layers["attention"]["q_norm"] = jnp.ones((n_layer, ad.head_dim), dtype)
        layers["attention"]["k_norm"] = jnp.ones((n_layer, ad.head_dim), dtype)
    return layers


def init_dual_ar_params(key: jax.Array, cfg: DualARConfig,
                        dtype=jnp.float32) -> dict:
    std = cfg.initializer_range
    ks = jax.random.split(key, 8)

    def w(k, shape):
        return (jax.random.truncated_normal(k, -2, 2, shape, jnp.float32)
                * std).astype(dtype)

    params = {
        "embeddings": w(ks[0], (cfg.vocab_size, cfg.dim)),
        "codebook_embeddings": w(ks[1], (cfg.codebook_size * cfg.num_codebooks, cfg.dim)),
        "layers": _init_stack(ks[2], cfg, cfg.slow_attn, cfg.n_layer,
                              cfg.intermediate_size, std, dtype),
        "norm": jnp.ones((cfg.dim,), dtype),
    }
    if cfg.is_naive:
        # parallel codebook head (ref NaiveTransformer, llama.py:613-624)
        params["codebook_norm"] = jnp.ones((cfg.dim,), dtype)
        params["codebook_output"] = w(
            ks[3], (cfg.codebook_size * cfg.num_codebooks, cfg.dim))
    else:
        params.update({
            "fast_embeddings": w(ks[3], (cfg.codebook_size, cfg.fast_dim)),
            "fast_layers": _init_stack(ks[4], cfg, cfg.fast_attn,
                                       cfg.n_fast_layer,
                                       cfg.fast_intermediate_size, std, dtype),
            "fast_norm": jnp.ones((cfg.fast_dim,), dtype),
            "fast_output": w(ks[5], (cfg.codebook_size, cfg.fast_dim)),
        })
    if not cfg.tie_word_embeddings:
        params["output"] = w(ks[6], (cfg.vocab_size, cfg.dim))
    if cfg.fast_dim != cfg.dim and not cfg.is_naive:
        params["fast_project_in"] = {
            "w": w(ks[7], (cfg.fast_dim, cfg.dim)),
            "b": jnp.zeros((cfg.fast_dim,), dtype),
        }
    return params


def _convert_stack(sd: dict, prefix: str, n_layer: int, ad: AttnDims, dtype) -> dict:
    def stack(fmt):
        return jnp.asarray(np.stack([sd[fmt.format(i=i)] for i in range(n_layer)]),
                           dtype=dtype)

    layers = {
        "attention": {
            "wqkv": stack(prefix + ".{i}.attention.wqkv.weight"),
            "wo": stack(prefix + ".{i}.attention.wo.weight"),
        },
        "feed_forward": {
            "w1": stack(prefix + ".{i}.feed_forward.w1.weight"),
            "w2": stack(prefix + ".{i}.feed_forward.w2.weight"),
            "w3": stack(prefix + ".{i}.feed_forward.w3.weight"),
        },
        "attention_norm": stack(prefix + ".{i}.attention_norm.weight"),
        "ffn_norm": stack(prefix + ".{i}.ffn_norm.weight"),
    }
    if ad.qkv_bias:
        layers["attention"]["wqkv_b"] = stack(prefix + ".{i}.attention.wqkv.bias")
    if ad.o_bias:
        layers["attention"]["wo_b"] = stack(prefix + ".{i}.attention.wo.bias")
    if ad.qk_norm:
        layers["attention"]["q_norm"] = stack(prefix + ".{i}.attention.q_norm.weight")
        layers["attention"]["k_norm"] = stack(prefix + ".{i}.attention.k_norm.weight")
    return layers


def convert_dual_ar_state_dict(sd: dict, cfg: DualARConfig,
                               dtype=jnp.float32) -> dict:
    """{name: np.ndarray} (reference naming) -> our pytree."""
    params = {
        "embeddings": jnp.asarray(sd["embeddings.weight"], dtype=dtype),
        "codebook_embeddings": jnp.asarray(sd["codebook_embeddings.weight"], dtype=dtype),
        "layers": _convert_stack(sd, "layers", cfg.n_layer, cfg.slow_attn, dtype),
        "norm": jnp.asarray(sd["norm.weight"], dtype=dtype),
    }
    if cfg.is_naive:
        params["codebook_norm"] = jnp.asarray(sd["codebook_norm.weight"], dtype=dtype)
        params["codebook_output"] = jnp.asarray(sd["codebook_output.weight"], dtype=dtype)
    else:
        params.update({
            "fast_embeddings": jnp.asarray(sd["fast_embeddings.weight"], dtype=dtype),
            "fast_layers": _convert_stack(sd, "fast_layers", cfg.n_fast_layer,
                                          cfg.fast_attn, dtype),
            "fast_norm": jnp.asarray(sd["fast_norm.weight"], dtype=dtype),
            "fast_output": jnp.asarray(sd["fast_output.weight"], dtype=dtype),
        })
    if not cfg.tie_word_embeddings:
        params["output"] = jnp.asarray(sd["output.weight"], dtype=dtype)
    if "fast_project_in.weight" in sd:
        params["fast_project_in"] = {
            "w": jnp.asarray(sd["fast_project_in.weight"], dtype=dtype),
            "b": jnp.asarray(sd["fast_project_in.bias"], dtype=dtype),
        }
    return params
