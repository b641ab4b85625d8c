"""Convert reference (torch) codec checkpoints into our parameter pytree.

Input is a flat ``{name: np.ndarray}`` state dict using the reference module
naming (/root/reference/fish_speech/models/dac/modded_dac.py +  rvq.py, plus
the descript-audio-codec quantizer submodules). Output is the nested pytree
consumed by fish_speech_tpu.codec.model / .rvq.

Layout transforms applied once here, so runtime kernels never reshape:
- weight-norm parametrizations are folded: w = g * v / ||v||  (norm over all
  dims except 0, matching torch weight_norm(dim=0))
- Conv1d  (out, in/g, k)  -> (k, in/g, out)
- ConvTranspose1d (in, out, k) -> (k, in, out) with the spatial axis flipped,
  so the transposed conv runs as an input-dilated regular conv
- Linear weights for pointwise (ConvNeXt mlp) are stored (in, out); attention
  / ffn weights keep torch (out, in) layout (the kernels transpose at use)
- Snake alpha (1, C, 1) -> (C,)
- per-codebook in/out projections + codebooks are stacked on a leading axis
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import DACConfig, RVQConfig

Array = np.ndarray


def _fold_weight_norm(sd: dict, prefix: str) -> Array:
    """Fold torch weight_norm parametrization into a plain kernel."""
    g_key = f"{prefix}.parametrizations.weight.original0"
    if g_key in sd:
        g = sd[g_key]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt(np.sum(np.square(v.astype(np.float64)), axis=axes, keepdims=True))
        return (g * (v / norm)).astype(v.dtype)
    return sd[f"{prefix}.weight"]


def _conv(sd: dict, prefix: str) -> dict:
    """CausalConvNet / WNConv1d at `prefix` (the inner nn.Conv1d is `.conv`
    for CausalConvNet; plain WNConv1d has weight directly)."""
    inner = f"{prefix}.conv" if f"{prefix}.conv.bias" in sd or \
        f"{prefix}.conv.parametrizations.weight.original0" in sd or \
        f"{prefix}.conv.weight" in sd else prefix
    w = _fold_weight_norm(sd, inner)
    b = sd.get(f"{inner}.bias")
    return {"w": jnp.asarray(w.transpose(2, 1, 0)),
            "b": None if b is None else jnp.asarray(b)}


def _conv_transpose(sd: dict, prefix: str) -> dict:
    inner = f"{prefix}.conv" if any(k.startswith(f"{prefix}.conv.") for k in sd) else prefix
    w = _fold_weight_norm(sd, inner)          # (in, out, k)
    b = sd.get(f"{inner}.bias")
    w = np.flip(w.transpose(2, 0, 1), axis=0).copy()  # (k, in, out), flipped
    return {"w": jnp.asarray(w), "b": None if b is None else jnp.asarray(b)}


def _snake(sd: dict, prefix: str) -> jnp.ndarray:
    return jnp.asarray(sd[f"{prefix}.alpha"].reshape(-1))


def _convnext(sd: dict, prefix: str) -> dict:
    dw = _conv(sd, f"{prefix}.dwconv")
    out = {
        "dwconv_w": dw["w"], "dwconv_b": dw["b"],
        "norm_w": jnp.asarray(sd[f"{prefix}.norm.weight"]),
        "norm_b": jnp.asarray(sd[f"{prefix}.norm.bias"]),
        "pw1_w": jnp.asarray(sd[f"{prefix}.pwconv1.weight"].T),
        "pw1_b": jnp.asarray(sd[f"{prefix}.pwconv1.bias"]),
        "pw2_w": jnp.asarray(sd[f"{prefix}.pwconv2.weight"].T),
        "pw2_b": jnp.asarray(sd[f"{prefix}.pwconv2.bias"]),
    }
    if f"{prefix}.gamma" in sd:
        out["gamma"] = jnp.asarray(sd[f"{prefix}.gamma"])
    return out


def _transformer(sd: dict, prefix: str, n_layer: int) -> dict:
    layers = []
    for i in range(n_layer):
        lp = f"{prefix}.layers.{i}"
        layers.append({
            "attention": {
                "wqkv": jnp.asarray(sd[f"{lp}.attention.wqkv.weight"]),
                "wo": jnp.asarray(sd[f"{lp}.attention.wo.weight"]),
            },
            "feed_forward": {
                "w1": jnp.asarray(sd[f"{lp}.feed_forward.w1.weight"]),
                "w2": jnp.asarray(sd[f"{lp}.feed_forward.w2.weight"]),
                "w3": jnp.asarray(sd[f"{lp}.feed_forward.w3.weight"]),
            },
            "attention_norm": jnp.asarray(sd[f"{lp}.attention_norm.weight"]),
            "ffn_norm": jnp.asarray(sd[f"{lp}.ffn_norm.weight"]),
            "attention_ls": jnp.asarray(sd[f"{lp}.attention_layer_scale.gamma"]),
            "ffn_ls": jnp.asarray(sd[f"{lp}.ffn_layer_scale.gamma"]),
        })
    out = {"layers": layers, "norm": jnp.asarray(sd[f"{prefix}.norm.weight"])}
    if f"{prefix}.input_proj.weight" in sd:
        out["input_proj_w"] = jnp.asarray(sd[f"{prefix}.input_proj.weight"])
        out["input_proj_b"] = jnp.asarray(sd[f"{prefix}.input_proj.bias"])
    if f"{prefix}.output_proj.weight" in sd:
        out["output_proj_w"] = jnp.asarray(sd[f"{prefix}.output_proj.weight"])
        out["output_proj_b"] = jnp.asarray(sd[f"{prefix}.output_proj.bias"])
    return out


def _residual_unit(sd: dict, prefix: str) -> dict:
    c1 = _conv(sd, f"{prefix}.block.1")
    c2 = _conv(sd, f"{prefix}.block.3")
    return {
        "snake1_alpha": _snake(sd, f"{prefix}.block.0"),
        "conv1_w": c1["w"], "conv1_b": c1["b"],
        "snake2_alpha": _snake(sd, f"{prefix}.block.2"),
        "conv2_w": c2["w"], "conv2_b": c2["b"],
    }


def _vq_stack(sd: dict, prefix: str, n: int):
    """Stack the n per-codebook quantizers under `prefix.quantizers.{i}`."""
    cbs, in_w, in_b, out_w, out_b = [], [], [], [], []
    for i in range(n):
        qp = f"{prefix}.quantizers.{i}"
        cbs.append(sd[f"{qp}.codebook.weight"])
        iw = _fold_weight_norm(sd, f"{qp}.in_proj")    # (d, D, 1)
        ow = _fold_weight_norm(sd, f"{qp}.out_proj")   # (D, d, 1)
        in_w.append(iw[..., 0].T)                      # (D, d)
        in_b.append(sd[f"{qp}.in_proj.bias"])
        out_w.append(ow[..., 0].T)                     # (d, D)
        out_b.append(sd[f"{qp}.out_proj.bias"])
    return (jnp.asarray(np.stack(cbs)), jnp.asarray(np.stack(in_w)),
            jnp.asarray(np.stack(in_b)), jnp.asarray(np.stack(out_w)),
            jnp.asarray(np.stack(out_b)))


def convert_quantizer(sd: dict, cfg: RVQConfig, prefix: str = "quantizer") -> dict:
    sem = _vq_stack(sd, f"{prefix}.semantic_quantizer", 1)
    res = _vq_stack(sd, f"{prefix}.quantizer", cfg.n_codebooks)
    params = {
        "semantic_codebooks": sem[0], "semantic_in_w": sem[1], "semantic_in_b": sem[2],
        "semantic_out_w": sem[3], "semantic_out_b": sem[4],
        "residual_codebooks": res[0], "residual_in_w": res[1], "residual_in_b": res[2],
        "residual_out_w": res[3], "residual_out_b": res[4],
        "downsample": [], "upsample": [],
    }
    for i in range(len(cfg.downsample_factor)):
        c = _conv(sd, f"{prefix}.downsample.{i}.0")
        params["downsample"].append({
            "conv_w": c["w"], "conv_b": c["b"],
            "convnext": _convnext(sd, f"{prefix}.downsample.{i}.1"),
        })
        ct = _conv_transpose(sd, f"{prefix}.upsample.{i}.0")
        params["upsample"].append({
            "conv_w": ct["w"], "conv_b": ct["b"],
            "convnext": _convnext(sd, f"{prefix}.upsample.{i}.1"),
        })
    t = cfg.pre_post_transformer
    params["pre_module"] = _transformer(sd, f"{prefix}.pre_module", t.n_layer)
    params["post_module"] = _transformer(sd, f"{prefix}.post_module", t.n_layer)
    return params


def convert_encoder(sd: dict, cfg: DACConfig, prefix: str = "encoder") -> dict:
    cin = _conv(sd, f"{prefix}.block.0")
    params = {"conv_in_w": cin["w"], "conv_in_b": cin["b"], "blocks": []}
    n_blocks = len(cfg.encoder_rates)
    dim = cfg.encoder_dim
    for bi in range(n_blocks):
        bp = f"{prefix}.block.{bi + 1}.block"
        dim *= 2
        strided = _conv(sd, f"{bp}.4")
        block = {
            "res_units": [_residual_unit(sd, f"{bp}.{u}") for u in range(3)],
            "snake_alpha": _snake(sd, f"{bp}.3"),
            "conv_w": strided["w"], "conv_b": strided["b"],
        }
        n_t = cfg.encoder_transformer_layers[bi]
        if n_t > 0:
            block["transformer"] = _transformer(sd, f"{bp}.5", n_t)
        params["blocks"].append(block)
    cout = _conv(sd, f"{prefix}.block.{n_blocks + 2}")
    params["snake_alpha"] = _snake(sd, f"{prefix}.block.{n_blocks + 1}")
    params["conv_out_w"] = cout["w"]
    params["conv_out_b"] = cout["b"]
    return params


def convert_decoder(sd: dict, cfg: DACConfig, prefix: str = "decoder") -> dict:
    cin = _conv(sd, f"{prefix}.model.0")
    params = {"conv_in_w": cin["w"], "conv_in_b": cin["b"], "blocks": []}
    n_blocks = len(cfg.decoder_rates)
    for bi in range(n_blocks):
        bp = f"{prefix}.model.{bi + 1}.block"
        ct = _conv_transpose(sd, f"{bp}.1")
        params["blocks"].append({
            "snake_alpha": _snake(sd, f"{bp}.0"),
            "conv_w": ct["w"], "conv_b": ct["b"],
            "res_units": [_residual_unit(sd, f"{bp}.{u}") for u in (2, 3, 4)],
        })
    cout = _conv(sd, f"{prefix}.model.{n_blocks + 2}")
    params["snake_alpha"] = _snake(sd, f"{prefix}.model.{n_blocks + 1}")
    params["conv_out_w"] = cout["w"]
    params["conv_out_b"] = cout["b"]
    return params


def convert_dac_state_dict(sd: dict, cfg: DACConfig) -> dict:
    """Full codec conversion. sd values must be numpy arrays (fp32)."""
    sd = {k[len("generator."):] if k.startswith("generator.") else k: v
          for k, v in sd.items()}
    return {
        "encoder": convert_encoder(sd, cfg),
        "quantizer": convert_quantizer(sd, cfg.rvq),
        "decoder": convert_decoder(sd, cfg),
    }
