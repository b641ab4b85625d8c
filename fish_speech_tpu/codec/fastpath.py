"""TPU-optimized vocoder decode path (serving hot path).

The reference's vocoder hot path (modded_dac.py:712-801 DecoderBlock/Decoder,
rvq.py:352-366 from_codes) is a conv pyramid. `model.decoder` expresses it
with `lax.conv_general_dilated`, which XLA lowers well for large channel
counts but leaves MXU utilization on the floor for this stack's small-channel
high-T stages (96..768 channels at up to 44.1 kHz sample positions).

This module re-expresses every stride-1 causal conv as a sum of k shifted
dense matmuls and every k=2*stride transposed conv as exactly two matmuls
with phase-expanded outputs:

  conv (stride 1):  y[t] = sum_i  x[t - (eff_k-1) + i*dil] @ W[i]
  tconv (k = 2s):   y[t*s + p] = x[t] @ W[2s-1-p] + x[t-1] @ W[s-1-p]

Both shapes map directly onto the MXU as (B*T, C_in) x (C_in, C_out') GEMMs
with huge M, so the compiler tiles them at full systolic-array occupancy
instead of scalarizing small-window convolutions. Numerics are identical
(same contraction order per output element, bf16 accumulate-in-f32 matmuls
like the conv path) — parity is tested against `model.decoder` in
tests/test_codec_fastpath.py.

All functions take the same parameter pytrees as codec/model.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .config import DACConfig, RVQConfig
from .nn import layer_norm, snake
from .rvq import _vq_lookup_sum

_DILATIONS = (1, 3, 9)


# ---------------------------------------------------------------------------
# Conv-as-matmul primitives
# ---------------------------------------------------------------------------


def conv1d_mm(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
              dilation: int = 1) -> jax.Array:
    """Stride-1 causal conv as k shifted matmuls. x (B,T,C_in), w (k,Cin,Cout).

    Left pad = eff_k - 1 (the causal pad of nn.causal_conv1d at stride 1),
    so output length == input length.
    """
    k = w.shape[0]
    if k == 1:
        y = x @ w[0].astype(x.dtype)
    else:
        eff = (k - 1) * dilation + 1
        xp = jnp.pad(x, ((0, 0), (eff - 1, 0), (0, 0)))
        t = x.shape[1]
        y = xp[:, :t] @ w[0].astype(x.dtype)
        for i in range(1, k):
            y = y + xp[:, i * dilation: i * dilation + t] @ w[i].astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)[None, None, :]
    return y


def conv_transpose1d_phases(x: jax.Array, phases: list, b: jax.Array | None,
                            *, stride: int) -> jax.Array:
    """conv_transpose1d_mm with the per-lag phase matrices precomputed
    (pack_decoder "tconv_phases"): phases[j] is (Cin, stride*Cout)."""
    bsz, t = x.shape[:2]
    cout = phases[0].shape[1] // stride
    y = None
    x_lag = x
    for j, wj2 in enumerate(phases):
        term = x_lag @ wj2.astype(x.dtype)
        y = term if y is None else y + term
        if j + 1 < len(phases):
            x_lag = jnp.pad(x_lag, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    y = y.reshape(bsz, t * stride, cout)
    if b is not None:
        y = y + b.astype(y.dtype)[None, None, :]
    return y


def conv_transpose1d_mm(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
                        stride: int) -> jax.Array:
    """Causal transposed conv with k == q*stride as q phase-expanded
    matmuls. With the causal right-trim of (k - s), output frame n = t*s + p
    (phase p in [0, s)) is

        y[t*s + p] = sum_{j=0}^{q-1} x[t - j] @ w[k-1 - p - j*s]

    i.e. for each input-lag j one (B*T, Cin) x (Cin, s*Cout) GEMM whose
    output phases are a flipped slice of the kernel. The decoder blocks have
    q=2 (k = 2*stride, init.py:138), the RVQ upsample q=1 (k = stride).
    Output (B, T*s, Cout)."""
    k, cin, cout = w.shape
    s = stride
    assert k % s == 0, f"conv_transpose1d_mm needs stride | k, got {k} vs {s}"
    q = k // s
    wf = w.astype(x.dtype)
    bsz, t = x.shape[:2]
    y = None
    x_lag = x
    for j in range(q):
        wj = jnp.flip(wf[k - (j + 1) * s: k - j * s], axis=0)  # (s, Cin, Cout)
        wj2 = jnp.transpose(wj, (1, 0, 2)).reshape(cin, s * cout)
        term = x_lag @ wj2
        y = term if y is None else y + term
        if j + 1 < q:
            x_lag = jnp.pad(x_lag, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    y = y.reshape(bsz, t * s, cout)
    if b is not None:
        y = y + b.astype(y.dtype)[None, None, :]
    return y


# ---------------------------------------------------------------------------
# Decoder stack on the matmul primitives
# ---------------------------------------------------------------------------


def residual_unit_mm(params: dict, x: jax.Array, dilation: int) -> jax.Array:
    y = snake(x, params["snake1_alpha"])
    y = conv1d_mm(y, params["conv1_w"], params["conv1_b"], dilation=dilation)
    y = snake(y, params["snake2_alpha"])
    y = conv1d_mm(y, params["conv2_w"], params["conv2_b"])
    return x + y


def decoder_block_mm(params: dict, x: jax.Array, stride: int) -> jax.Array:
    x = snake(x, params["snake_alpha"])
    x = conv_transpose1d_mm(x, params["conv_w"], params["conv_b"],
                            stride=stride)
    for unit, dilation in zip(params["res_units"], _DILATIONS):
        x = residual_unit_mm(unit, x, dilation)
    return x


def decoder_mm(params: dict, cfg: DACConfig, z: jax.Array) -> jax.Array:
    """Drop-in for model.decoder on the matmul primitives."""
    x = conv1d_mm(z, params["conv_in_w"], params["conv_in_b"])
    for block, stride in zip(params["blocks"], cfg.decoder_rates):
        x = decoder_block_mm(block, x, stride)
    x = snake(x, params["snake_alpha"])
    x = conv1d_mm(x, params["conv_out_w"], params["conv_out_b"])
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Pallas-fused decoder (the serving vocoder hot path)
# ---------------------------------------------------------------------------


def _tile_for(t: int, cap: int = 512) -> int:
    """Largest sublane-aligned tile size <= cap that divides t."""
    tt = min(cap, t)
    while t % tt or tt % 16:
        tt -= 16 if tt % 16 == 0 else tt % 16
        if tt <= 16:
            return 16 if t % 16 == 0 else t
    return tt


def _lane_pad(c: int) -> int:
    """Mosaic needs the kernel's channel (lane) dim % 128 == 0 (measured:
    c=96/192 fail remote compile, 128/256/384 pass). Padding is free on the
    MXU — it pads lanes to 128 internally anyway."""
    return -(-c // 128) * 128


def _pad_res_unit(u: dict, cp: int) -> dict:
    """Zero-pad a residual unit to cp channels. Padded channels stay exactly
    zero through the stack: snake(0)=0 (alpha pads with 1 so 1/(a+eps) is
    finite), zero weight rows/cols contribute nothing, residual keeps 0."""
    c = u["conv1_w"].shape[1]
    p = cp - c
    if p == 0:
        return u
    padw = lambda w: jnp.pad(w, ((0, 0), (0, p), (0, p)))
    return {
        "snake1_alpha": jnp.pad(u["snake1_alpha"], (0, p), constant_values=1.0),
        "snake2_alpha": jnp.pad(u["snake2_alpha"], (0, p), constant_values=1.0),
        "conv1_w": padw(u["conv1_w"]), "conv1_b": jnp.pad(u["conv1_b"], (0, p)),
        "conv2_w": padw(u["conv2_w"]), "conv2_b": jnp.pad(u["conv2_b"], (0, p)),
    }


def pack_decoder(params: dict, cfg: DACConfig, dtype=jnp.bfloat16,
                 quant: bool | None = None) -> dict:
    """Pre-pack the whole decoder for `decoder_pallas`: per-stage fused-unit
    weights (ops/voc_fused.pack_res_stack) and phase-matmul transposed-conv
    weights, all zero-padded to lane-aligned channel counts so the entire
    stack runs in padded channel space with no per-call pad/slice ops.

    quant=True (default: env VOC_QUANT=1) int8-quantizes the fused-path
    conv weights so the kernels run at the MXU's 2x int8 rate with per-tile
    activation scales — an accuracy trade beyond the reference's bf16
    vocoder; measured waveform/mel drift in tests/test_codec_fastpath.py
    and docs/serving.md."""
    from ..ops.voc_fused import pack_res_stack

    if quant is None:
        quant = os.environ.get("VOC_QUANT", "0") == "1"

    dims = [cfg.decoder_dim // (2 ** (i + 1))
            for i in range(len(cfg.decoder_rates))]
    out = {"conv_in_w": params["conv_in_w"].astype(dtype),
           "conv_in_b": params["conv_in_b"].astype(dtype), "blocks": []}
    c_in_p = _lane_pad(cfg.decoder_dim)
    assert c_in_p == cfg.decoder_dim, "decoder_dim must be lane-aligned"
    for block, dim in zip(params["blocks"], dims):
        cp = _lane_pad(dim)
        tw = block["conv_w"]  # (k, c_in, dim); c_in of stage 0 is aligned
        cin_prev = tw.shape[1]
        tw = jnp.pad(tw, ((0, 0), (0, _lane_pad(cin_prev) - cin_prev),
                          (0, cp - dim))).astype(dtype)
        # phase-expanded transposed-conv weights precomputed at pack time
        # (the per-lag flip/transpose/reshape in conv_transpose1d_mm would
        # otherwise sit in every call's graph); the raw tconv_w is NOT
        # kept — phases are its only consumer in decoder_pallas
        k_t, cin_p, cout_p = tw.shape
        stride = cfg.decoder_rates[len(out["blocks"])]
        phases = []
        for j in range(k_t // stride):
            wj = jnp.flip(tw[k_t - (j + 1) * stride: k_t - j * stride],
                          axis=0)
            phases.append(jnp.transpose(wj, (1, 0, 2))
                          .reshape(cin_p, stride * cout_p))
        res = pack_res_stack(
            [_pad_res_unit(u, cp) for u in block["res_units"]], dtype=dtype,
            quant=quant)
        if cp <= int(os.environ.get("VOC_FUSED_BLOCK_MAX_C", "512")) \
                and len(phases) == 2:
            # fused-block form (ops/voc_fused.fused_block): stacked phase
            # weights + the bias tiled per phase, matching the kernel's
            # (n_in, stride*C) accumulator layout
            pw = jnp.stack(phases)
            bias = jnp.pad(block["conv_b"], (0, cp - dim)).astype(jnp.float32)
            pb = jnp.tile(bias, stride)[None, :]
            if quant:
                pwf = pw.astype(jnp.float32)
                ps = jnp.maximum(jnp.max(jnp.abs(pwf), axis=(0, 1)), 1e-12)
                pw = jnp.round(pwf / ps[None, None, :] * 127.0
                               ).astype(jnp.int8)
                pb = jnp.concatenate([pb, (ps / 127.0)[None, :]])
            res["tconv_pw"] = pw
            res["tconv_pb"] = pb
        out["blocks"].append({
            "snake_alpha": jnp.pad(
                block["snake_alpha"], (0, _lane_pad(cin_prev) - cin_prev),
                constant_values=1.0).astype(jnp.float32),
            "tconv_phases": phases,
            "tconv_b": jnp.pad(block["conv_b"], (0, cp - dim)).astype(dtype),
            "res": res,
        })
    c_last = dims[-1]
    cp_last = _lane_pad(c_last)
    out["snake_alpha"] = jnp.pad(params["snake_alpha"],
                                 (0, cp_last - c_last),
                                 constant_values=1.0).astype(jnp.float32)
    # per-block fused tail snake = the NEXT block's entry snake (or the
    # decoder-final snake): consumed only by the following op, and XLA's
    # own sin lowering costs 10-115 ms at these tensor sizes (measured)
    for i, blk in enumerate(out["blocks"]):
        nxt = (out["blocks"][i + 1]["snake_alpha"]
               if i + 1 < len(out["blocks"]) else out["snake_alpha"])
        # row 0 pre-multiplied by 1/pi (the kernel snake's alpha_pi form)
        blk["tail_vec"] = jnp.stack([nxt * float(1.0 / jnp.pi),
                                     1.0 / (nxt + 1e-9)])
    out["conv_out_w"] = jnp.pad(params["conv_out_w"],
                                ((0, 0), (0, cp_last - c_last),
                                 (0, 0))).astype(dtype)
    out["conv_out_b"] = params["conv_out_b"].astype(dtype)
    if "tconv_pw" in out["blocks"][-1]["res"]:
        # decoder-final conv (k, C, 1) + bias row, fused into the last
        # block's kernel (ops/voc_fused fk path)
        fw = jnp.pad(params["conv_out_w"][:, :, 0],
                     ((0, 0), (0, cp_last - c_last))).astype(jnp.float32)
        bias_row = jnp.zeros((1, cp_last), jnp.float32
                             ).at[0, 0].set(params["conv_out_b"][0])
        out["final_fw"] = jnp.concatenate([fw, bias_row])
    return out


def decoder_pallas(params: dict, cfg: DACConfig, z: jax.Array,
                   packed: dict | None = None) -> jax.Array:
    """model.decoder with the residual-unit stacks on the fused Pallas
    kernel (one HBM round-trip + MXU dots per stack) and the transposed
    convs as phase-expanded matmuls, entirely in lane-padded channel space.
    Numerics: bf16 dots, f32 accumulation (same contraction content as the
    conv path; parity tested)."""
    from ..ops.voc_fused import fused_block, fused_res_stack

    if packed is None:
        packed = pack_decoder(params, cfg, dtype=z.dtype)
    x = conv1d_mm(z, packed["conv_in_w"], packed["conv_in_b"])
    # block 0's entry snake has no preceding kernel to ride in: exact sin
    # via the f32 cast-sandwich (the only fast XLA sin form, measured
    # 9.5 ms vs 115 ms bf16 at 33M elements; this tensor is ~6M)
    a0 = packed["blocks"][0]["snake_alpha"]
    x = snake(x.astype(jnp.float32), a0).astype(x.dtype)
    for bi, (pb, stride) in enumerate(zip(packed["blocks"],
                                          cfg.decoder_rates)):
        # entry snakes of later blocks + the decoder-final snake are fused
        # into the previous stage's kernel (tail_vec); none appear here
        cp = pb["tconv_phases"][0].shape[1] // stride  # padded channels
        if "tconv_pw" in pb["res"]:
            # whole block (tconv + units + tail) in one pallas_call: no
            # post-tconv HBM round-trip (the chained form paid ~100 ms per
            # decode in stage-boundary fusions/DMA outside the kernels)
            cap = 2048 if cp <= 128 else (1024 if cp <= 256 else 512)
            tt = _tile_for(x.shape[1] * stride, cap)
            last = bi == len(packed["blocks"]) - 1
            if last and "final_fw" in packed and tt % 128 == 0:
                # decoder-final conv+tanh fused too: kernel emits waveform
                wave = fused_block(x, pb["res"], stride=stride, tt=tt,
                                   dilations=_DILATIONS,
                                   tail_vec=pb["tail_vec"],
                                   final_w=packed["final_fw"])
                return wave[..., None]
            x = fused_block(x, pb["res"], stride=stride, tt=tt,
                            dilations=_DILATIONS, tail_vec=pb["tail_vec"])
            continue
        x = conv_transpose1d_phases(x, pb["tconv_phases"],
                                    pb["tconv_b"], stride=stride)
        if cp > 512:
            # 3-unit weight set would blow VMEM: one unit per call
            for u in range(len(_DILATIONS)):
                sub = {k: v[u:u + 1] for k, v in pb["res"].items()
                       if k not in ("tail_vec", "tconv_pw", "tconv_pb")}
                last = u == len(_DILATIONS) - 1
                x = fused_res_stack(x, sub, tt=_tile_for(x.shape[1], 256),
                                    dilations=(_DILATIONS[u],),
                                    tail_vec=pb["tail_vec"] if last else None)
        else:
            # tile cap by channel width: small-C stages have huge T, so
            # larger tiles amortize per-grid-step overhead (VMEM budget:
            # ~4 f32 buffers of (tt+halo, cp) + 8*cp^2 weights + 2 bf16
            # input slots must stay under ~14 MB)
            cap = 2048 if cp <= 128 else (1024 if cp <= 256 else 512)
            x = fused_res_stack(x, pb["res"], tt=_tile_for(x.shape[1], cap),
                                dilations=_DILATIONS,
                                tail_vec=pb["tail_vec"])
    x = conv1d_mm(x, packed["conv_out_w"], packed["conv_out_b"])
    return jnp.tanh(x)


def dac_from_indices_pallas(params: dict, cfg: DACConfig, indices: jax.Array,
                            packed: dict | None = None) -> jax.Array:
    """Drop-in for model.dac_from_indices with the Pallas-fused decoder."""
    z = rvq_decode_mm(params["quantizer"], cfg.rvq, indices)
    return decoder_pallas(params["decoder"], cfg, z, packed=packed)[..., 0]


def convnext_block_mm(params: dict, x: jax.Array) -> jax.Array:
    """ConvNeXt block with the depthwise conv as shifted elementwise
    multiplies (VPU) instead of a grouped convolution."""
    inp = x
    w = params["dwconv_w"]  # (k, 1, C)
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    t = x.shape[1]
    y = xp[:, :t] * w[0, 0].astype(x.dtype)
    for i in range(1, k):
        y = y + xp[:, i: i + t] * w[i, 0].astype(x.dtype)
    y = y + params["dwconv_b"].astype(y.dtype)
    y = layer_norm(y, params["norm_w"], params["norm_b"], 1e-6)
    y = y @ params["pw1_w"] + params["pw1_b"]
    y = jax.nn.gelu(y, approximate=False)
    y = y @ params["pw2_w"] + params["pw2_b"]
    if "gamma" in params:
        y = params["gamma"] * y
    return inp + y


def rvq_upsample_mm(params: dict, x: jax.Array, cfg: RVQConfig) -> jax.Array:
    for stage, factor in zip(params["upsample"],
                             reversed(cfg.downsample_factor)):
        x = conv_transpose1d_mm(x, stage["conv_w"], stage["conv_b"],
                                stride=factor)
        x = convnext_block_mm(stage["convnext"], x)
    return x


def rvq_decode_mm(params: dict, cfg: RVQConfig, indices: jax.Array) -> jax.Array:
    from .nn import codec_transformer

    semantic = jnp.clip(indices[:, :1], 0, cfg.semantic_codebook_size - 1)
    residual = jnp.clip(indices[:, 1:], 0, cfg.codebook_size - 1)
    z = (_vq_lookup_sum(semantic, params["semantic_codebooks"],
                        params["semantic_out_w"], params["semantic_out_b"])
         + _vq_lookup_sum(residual, params["residual_codebooks"],
                          params["residual_out_w"], params["residual_out_b"]))
    z = codec_transformer(params["post_module"], cfg.pre_post_transformer, z)
    return rvq_upsample_mm(params, z, cfg)


def dac_from_indices_mm(params: dict, cfg: DACConfig,
                        indices: jax.Array) -> jax.Array:
    """Drop-in for model.dac_from_indices on the matmul primitives."""
    z = rvq_decode_mm(params["quantizer"], cfg.rvq, indices)
    return decoder_mm(params["decoder"], cfg, z)[..., 0]
