"""Random parameter initialization for the codec (no checkpoint needed).

Shapes mirror convert.py's output layout exactly. Used by benches, smoke
tests, and the graft entry; real checkpoints come through convert.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import CodecTransformerConfig, DACConfig, RVQConfig

_STD = 0.02


class _Rng:
    def __init__(self, key):
        self.key = key

    def next(self):
        self.key, sub = jax.random.split(self.key)
        return sub


def _w(rng: _Rng, shape, std=_STD):
    return jax.random.truncated_normal(rng.next(), -2.0, 2.0, shape, jnp.float32) * std


def _conv_p(rng, k, cin, cout, groups=1):
    return {"w": _w(rng, (k, cin // groups, cout)), "b": jnp.zeros((cout,))}


def _convnext_p(rng, dim, mlp_ratio=4.0, kernel=7):
    hidden = int(mlp_ratio * dim)
    return {
        "dwconv_w": _w(rng, (kernel, 1, dim)), "dwconv_b": jnp.zeros((dim,)),
        "norm_w": jnp.ones((dim,)), "norm_b": jnp.zeros((dim,)),
        "pw1_w": _w(rng, (dim, hidden)), "pw1_b": jnp.zeros((hidden,)),
        "pw2_w": _w(rng, (hidden, dim)), "pw2_b": jnp.zeros((dim,)),
        "gamma": jnp.full((dim,), 1e-6),
    }


def _transformer_p(rng, cfg: CodecTransformerConfig, input_dim: int | None = None):
    layers = []
    qkv_dim = 3 * cfg.n_head * cfg.head_dim
    for _ in range(cfg.n_layer):
        layers.append({
            "attention": {
                "wqkv": _w(rng, (qkv_dim, cfg.dim)),
                "wo": _w(rng, (cfg.dim, cfg.n_head * cfg.head_dim)),
            },
            "feed_forward": {
                "w1": _w(rng, (cfg.intermediate_size, cfg.dim)),
                "w2": _w(rng, (cfg.dim, cfg.intermediate_size)),
                "w3": _w(rng, (cfg.intermediate_size, cfg.dim)),
            },
            "attention_norm": jnp.ones((cfg.dim,)),
            "ffn_norm": jnp.ones((cfg.dim,)),
            "attention_ls": jnp.full((cfg.dim,), 1e-2),
            "ffn_ls": jnp.full((cfg.dim,), 1e-2),
        })
    p = {"layers": layers, "norm": jnp.ones((cfg.dim,))}
    if input_dim is not None and input_dim != cfg.dim:
        p["input_proj_w"] = _w(rng, (cfg.dim, input_dim))
        p["input_proj_b"] = jnp.zeros((cfg.dim,))
        p["output_proj_w"] = _w(rng, (input_dim, cfg.dim))
        p["output_proj_b"] = jnp.zeros((input_dim,))
    return p


def _res_unit_p(rng, dim):
    return {
        "snake1_alpha": jnp.ones((dim,)),
        "conv1_w": _w(rng, (7, dim, dim)), "conv1_b": jnp.zeros((dim,)),
        "snake2_alpha": jnp.ones((dim,)),
        "conv2_w": _w(rng, (1, dim, dim)), "conv2_b": jnp.zeros((dim,)),
    }


def init_quantizer(rng: _Rng, cfg: RVQConfig) -> dict:
    d, cd = cfg.input_dim, cfg.codebook_dim
    params = {
        "semantic_codebooks": _w(rng, (1, cfg.semantic_codebook_size, cd), 1.0),
        "semantic_in_w": _w(rng, (1, d, cd)), "semantic_in_b": jnp.zeros((1, cd)),
        "semantic_out_w": _w(rng, (1, cd, d)), "semantic_out_b": jnp.zeros((1, d)),
        "residual_codebooks": _w(rng, (cfg.n_codebooks, cfg.codebook_size, cd), 1.0),
        "residual_in_w": _w(rng, (cfg.n_codebooks, d, cd)),
        "residual_in_b": jnp.zeros((cfg.n_codebooks, cd)),
        "residual_out_w": _w(rng, (cfg.n_codebooks, cd, d)),
        "residual_out_b": jnp.zeros((cfg.n_codebooks, d)),
        "downsample": [], "upsample": [],
    }
    for factor in cfg.downsample_factor:
        c = _conv_p(rng, factor, d, d)
        params["downsample"].append({"conv_w": c["w"], "conv_b": c["b"],
                                     "convnext": _convnext_p(rng, d)})
        ct = _conv_p(rng, factor, d, d)
        params["upsample"].append({"conv_w": ct["w"], "conv_b": ct["b"],
                                   "convnext": _convnext_p(rng, d)})
    t = cfg.pre_post_transformer
    params["pre_module"] = _transformer_p(rng, t, cfg.input_dim)
    params["post_module"] = _transformer_p(rng, t, cfg.input_dim)
    return params


def init_encoder(rng: _Rng, cfg: DACConfig) -> dict:
    c = _conv_p(rng, 7, 1, cfg.encoder_dim)
    params = {"conv_in_w": c["w"], "conv_in_b": c["b"], "blocks": []}
    dim = cfg.encoder_dim
    for stride, n_t in zip(cfg.encoder_rates, cfg.encoder_transformer_layers):
        dim *= 2
        sc = _conv_p(rng, 2 * stride, dim // 2, dim)
        block = {
            "res_units": [_res_unit_p(rng, dim // 2) for _ in range(3)],
            "snake_alpha": jnp.ones((dim // 2,)),
            "conv_w": sc["w"], "conv_b": sc["b"],
        }
        if n_t > 0:
            block["transformer"] = _transformer_p(
                rng, cfg.encoder_block_transformer(dim, n_t))
        params["blocks"].append(block)
    co = _conv_p(rng, 3, dim, cfg.resolved_latent_dim)
    params["snake_alpha"] = jnp.ones((dim,))
    params["conv_out_w"] = co["w"]
    params["conv_out_b"] = co["b"]
    return params


def init_decoder(rng: _Rng, cfg: DACConfig) -> dict:
    c = _conv_p(rng, 7, cfg.resolved_latent_dim, cfg.decoder_dim)
    params = {"conv_in_w": c["w"], "conv_in_b": c["b"], "blocks": []}
    dim = cfg.decoder_dim
    for i, stride in enumerate(cfg.decoder_rates):
        in_dim = cfg.decoder_dim // (2 ** i)
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        ct = _conv_p(rng, 2 * stride, in_dim, out_dim)
        params["blocks"].append({
            "snake_alpha": jnp.ones((in_dim,)),
            "conv_w": ct["w"], "conv_b": ct["b"],
            "res_units": [_res_unit_p(rng, out_dim) for _ in range(3)],
        })
        dim = out_dim
    co = _conv_p(rng, 7, dim, 1)
    params["snake_alpha"] = jnp.ones((dim,))
    params["conv_out_w"] = co["w"]
    params["conv_out_b"] = co["b"]
    return params


def init_dac_params(key: jax.Array, cfg: DACConfig) -> dict:
    rng = _Rng(key)
    return {
        "encoder": init_encoder(rng, cfg),
        "quantizer": init_quantizer(rng, cfg.rvq),
        "decoder": init_decoder(rng, cfg),
    }
