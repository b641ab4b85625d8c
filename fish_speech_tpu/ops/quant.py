"""Int8 weight-only quantization (per-output-channel symmetric).

TPU-native equivalent of the reference PTQ tooling
(/root/reference/tools/llama/quantize.py:190-297, WeightOnlyInt8*): weights
live in HBM as int8 + per-channel fp scales (2x less decode bandwidth — the
4B decode loop is weight-bandwidth-bound), dequantized on the fly; XLA fuses
the convert+scale into the consuming matmul's operand read.

A quantized weight is the pytree node {"q": int8[..., out, in],
"s": f32[..., out]}. `as_weight`/`take_rows` below are the only accessors the
model uses, so plain and quantized checkpoints share every code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> dict:
    """(..., out, in) -> {"q": int8, "s": f32 (..., out)}."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[..., None]), -128, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def quantize_weight_int4(w: jax.Array, groupsize: int = 128) -> dict:
    """Groupwise int4 (ref quantize.py WeightOnlyInt4, 300-424): values in a
    native jnp.int4 tensor, fp32 scale per (out-channel, input-group)."""
    *lead, out, inner = w.shape
    assert inner % groupsize == 0, (inner, groupsize)
    wf = jnp.asarray(w, jnp.float32).reshape(*lead, out, inner // groupsize,
                                             groupsize)
    scale = jnp.max(jnp.abs(wf), axis=-1) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[..., None]), -8, 7)
    return {"q": q.reshape(*lead, out, inner).astype(jnp.int4),
            "gs": scale}  # (..., out, inner/groupsize)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and ("s" in w or "gs" in w)


def as_weight(w, dtype=jnp.bfloat16):
    """Materialize (virtually — XLA fuses into the consumer) a usable weight."""
    if not is_quantized(w):
        return w
    if "s" in w:  # per-channel int8
        return w["q"].astype(dtype) * w["s"][..., None].astype(dtype)
    # groupwise int4
    *lead, out, inner = w["q"].shape
    groups = w["gs"].shape[-1]
    deq = (w["q"].astype(dtype).reshape(*lead, out, groups, inner // groups)
           * w["gs"][..., None].astype(dtype))
    return deq.reshape(*lead, out, inner)


def matmul_t(x: jax.Array, w, *, w8a8: bool = False) -> jax.Array:
    """x @ W.T for a plain or quantized weight leaf.

    w8a8=True + per-channel int8 weight: dynamic per-row activation
    quantization and a native int8xint8->int32 MXU dot (2x the bf16 MXU rate
    on v5e, and no weight-dequant VPU pass), rescaled by the rank-1 outer
    product of activation and channel scales. At the 4B serving batch the
    decode step is MXU-bound, so this is the serving fast path; it is an
    accuracy trade (the reference's PTQ is weight-only, tools/llama/
    quantize.py:190) and stays opt-in via DualARConfig.w8a8_matmuls."""
    if not is_quantized(w):
        return x @ w.T
    if w8a8 and "s" in w:
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
        x8 = jnp.round(xf / xs).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, w["q"],
            (((x8.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * xs * w["s"].astype(jnp.float32)
        return y.astype(x.dtype)
    return x @ as_weight(w, x.dtype).T


def take_rows(w, idx, dtype=jnp.bfloat16):
    """Embedding-style row gather that dequantizes only the gathered rows."""
    if not is_quantized(w):
        return jnp.take(w, idx, axis=0)
    if "s" in w:
        rows = jnp.take(w["q"], idx, axis=0).astype(dtype)
        scales = jnp.take(w["s"], idx, axis=0).astype(dtype)
        return rows * scales[..., None]
    out, inner = w["q"].shape
    groups = w["gs"].shape[-1]
    rows = jnp.take(w["q"], idx, axis=0).astype(dtype)
    scales = jnp.take(w["gs"], idx, axis=0).astype(dtype)
    rows = rows.reshape(*rows.shape[:-1], groups, inner // groups)
    return (rows * scales[..., None]).reshape(*scales.shape[:-1], inner)


def slice_rows(w, start: int, stop: int):
    """Static row-slice of a (possibly quantized) (V, D) weight — used to
    compute logits only over the constrained sampling support instead of the
    full vocabulary (37x fewer rows for the 4B model's 152k vocab)."""
    if not is_quantized(w):
        return w[start:stop]
    out = {"q": w["q"][start:stop]}
    if "s" in w:
        out["s"] = w["s"][start:stop]
    else:
        out["gs"] = w["gs"][start:stop]
    return out


_LM_QUANT_LEAVES = {"wqkv", "wo", "w1", "w2", "w3"}
_LM_QUANT_TOP = {"embeddings", "codebook_embeddings", "fast_embeddings",
                 "output", "fast_output"}


def quantize_lm_params(params: dict, mode: str = "int8",
                       groupsize: int = 128) -> dict:
    """Quantize the Dual-AR parameter pytree's large matrices; norms, biases
    and small projections are cast to bf16 (a quantized model is a deployment
    artifact — uniform activation dtype keeps scan carries consistent).
    mode: "int8" (per-channel) or "int4" (groupwise)."""

    def visit(path, w):
        keys = [getattr(p, "key", None) for p in path]
        leaf = keys[-1]
        target = leaf in _LM_QUANT_LEAVES or (leaf in _LM_QUANT_TOP
                                              and len(keys) == 1)
        if target and w.ndim >= 2:
            if mode == "int4" and w.shape[-1] % groupsize == 0:
                return quantize_weight_int4(w, groupsize)
            return quantize_weight(w)
        if jnp.issubdtype(w.dtype, jnp.floating):
            return w.astype(jnp.bfloat16)
        return w

    return jax.tree_util.tree_map_with_path(visit, params)
