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


def quantize_weight_int4_packed(w: jax.Array, groupsize: int = 128) -> dict:
    """Groupwise int4 with the nibbles MANUALLY packed two-per-int8 byte:
    {"q4": int8 (..., out, inner/2), "gs": f32 (..., out, inner/groupsize)}.

    SPLIT-HALF packing: byte j = (value[j + inner/2] << 4) | (value[j] & 0xF)
    — unpacking is a lane-BLOCK concat of the two sign-extended halves
    (Mosaic-friendly; an even/odd interleave would need a fine lane shuffle
    inside the W4A8 kernel). Requires groupsize | inner/2 so group
    boundaries stay aligned within each half. This is the runnable serving
    form on TPU: the native jnp.int4 dtype cannot cross the jit boundary on
    the axon plugin (transfer recursion), while int8 storage with in-kernel
    arithmetic-shift unpack halves the weight bytes read from HBM."""
    *lead, out, inner = w.shape
    half = inner // 2
    assert inner % groupsize == 0 and half % groupsize == 0, (inner, groupsize)
    wf = jnp.asarray(w, jnp.float32).reshape(*lead, out, inner // groupsize,
                                             groupsize)
    scale = jnp.max(jnp.abs(wf), axis=-1) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    # int8 arithmetic throughout: int32 intermediates on the whole-tree jit
    # quantize of the 4B model cost ~9 GB of HLO temps (OOM'd beside the
    # bf16 arguments)
    q = jnp.clip(jnp.round(wf / scale[..., None]), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, out, inner)
    lo = q[..., :half]
    hi = q[..., half:]
    packed = jnp.left_shift(hi, 4) | (lo & jnp.int8(0xF))
    return {"q4": packed, "gs": scale}


def unpack_int4(q4: jax.Array) -> jax.Array:
    """int8-packed nibbles (..., inner/2) -> int8 values (..., inner),
    split-half convention: low nibbles are values [0, inner/2), high
    nibbles are [inner/2, inner). Arithmetic shifts sign-extend."""
    lo = jnp.right_shift(jnp.left_shift(q4, 4), 4)
    hi = jnp.right_shift(q4, 4)
    return jnp.concatenate([lo, hi], axis=-1)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w) and (
        "s" in w or "gs" in w)


def as_weight(w, dtype=jnp.bfloat16):
    """Materialize (virtually — XLA fuses into the consumer) a usable weight."""
    if not is_quantized(w):
        return w
    if "s" in w:  # per-channel int8
        return w["q"].astype(dtype) * w["s"][..., None].astype(dtype)
    # groupwise int4 (native or nibble-packed)
    q = unpack_int4(w["q4"]) if "q4" in w else w["q"]
    *lead, out, inner = q.shape
    groups = w["gs"].shape[-1]
    deq = (q.astype(dtype).reshape(*lead, out, groups, inner // groups)
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
    if w8a8 and "gs" in w:
        # W4A8: int8 activations x int4 groupwise weights (ref executes the
        # int4 path in its serving loop via aten._weight_int4pack_mm,
        # tools/llama/quantize.py:252-260). Grouped formulation: one
        # G-batched int8xint8->int32 MXU dot over (gsz)-wide contractions,
        # rescaled per (row, out-channel, group) and summed over groups.
        # Serving stores the nibbles packed two-per-int8 ("q4"): HBM sees
        # half the int8 weight bytes (the 4B decode step's dominant
        # bucket). On TPU the decode-shaped case routes through the Pallas
        # kernel (ops/w4a8.py) whose unpack stays in VMEM — the XLA
        # formulation below materializes the unpacked weights to HBM and
        # measured 4x slower than int8 W8A8 at 4B B=256. Prefill
        # (large M: activations would blow VMEM) keeps the XLA path.
        import numpy as _np

        m_total = int(_np.prod(x.shape[:-1]))
        # Pallas gate: the kernel keeps the full (M, K) int8 activation in
        # one VMEM block beside the per-tile int32 unpack temps, so admit
        # only shapes whose activation block is <=4 MB (M=1024 at K=9728 is
        # ~10 MB and can fail VMEM allocation at compile time even though
        # M alone looks small); the out dim must also have a lane-aligned
        # tile (w4a8_matmul searches divisors of n in 128 steps).
        if ("q4" in w and jax.default_backend() == "tpu"
                and m_total <= 1024
                and m_total * x.shape[-1] <= 4 * 1024 * 1024
                and w["q4"].shape[0] % 128 == 0):
            from .w4a8 import matmul_t_w4a8_pallas

            return matmul_t_w4a8_pallas(x, w)
        q8 = (unpack_int4(w["q4"]) if "q4" in w
              else w["q"].astype(jnp.int8))
        out_dim, inner = q8.shape
        groups = w["gs"].shape[-1]
        gsz = inner // groups
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
        x8 = jnp.round(xf / xs).astype(jnp.int8)
        x8g = x8.reshape(*x8.shape[:-1], groups, gsz)
        q8 = q8.reshape(out_dim, groups, gsz)
        nb = x8.ndim - 1
        acc = jax.lax.dot_general(
            x8g, q8,
            (((x8g.ndim - 1,), (2,)), ((x8g.ndim - 2,), (1,))),
            preferred_element_type=jnp.int32)        # (G, *lead, out)
        gsb = (w["gs"].T.astype(jnp.float32)
               .reshape((groups,) + (1,) * nb + (out_dim,)))
        y = jnp.sum(acc.astype(jnp.float32) * gsb, axis=0) * xs
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
    out = ({"q4": w["q4"][start:stop]} if "q4" in w
           else {"q": w["q"][start:stop]})
    if "s" in w:
        out["s"] = w["s"][start:stop]
    else:
        out["gs"] = w["gs"][start:stop]
    return out


def pack_int4_params(params: dict) -> dict:
    """Convert native-int4 leaves ({"q" int4, "gs"}) — the checkpoint form —
    to the nibble-packed serving form ({"q4" int8, "gs"}); other leaves pass
    through. Use after loading an int4 checkpoint for TPU serving."""

    def visit(w):
        if is_quantized(w) and "gs" in w and "q" in w:
            q = w["q"].astype(jnp.int8)
            half = q.shape[-1] // 2
            lo, hi = q[..., :half], q[..., half:]
            return {"q4": jnp.left_shift(hi, 4) | (lo & jnp.int8(0xF)),
                    "gs": w["gs"]}
        return w

    return jax.tree.map(visit, params, is_leaf=is_quantized)


_LM_QUANT_LEAVES = {"wqkv", "wo", "w1", "w2", "w3"}
_LM_QUANT_TOP = {"embeddings", "codebook_embeddings", "fast_embeddings",
                 "output", "fast_output"}


def quantize_lm_params(params: dict, mode: str = "int8",
                       groupsize: int = 128) -> dict:
    """Quantize the Dual-AR parameter pytree's large matrices; norms, biases
    and small projections are cast to bf16 (a quantized model is a deployment
    artifact — uniform activation dtype keeps scan carries consistent).

    mode: "int8" (per-channel), "int4" (groupwise, native jnp.int4 — the
    checkpoint form), or "w4a8" (groupwise int4 packed two-nibbles-per-int8
    — the runnable serving form; jnp.int4 cannot cross the jit boundary on
    the TPU plugin). int4/w4a8 apply to the SLOW stack's matmul weights
    only — the decode step's weight-bandwidth bucket — while fast layers
    and embeddings stay int8 (the fused fast-head kernel streams int8
    tiles, and gathered embedding rows are not bandwidth-bound). With
    w8a8_matmuls on, int4 leaves take the W4A8 grouped MXU path in
    matmul_t."""

    def visit(path, w):
        keys = [getattr(p, "key", None) for p in path]
        leaf = keys[-1]
        target = leaf in _LM_QUANT_LEAVES or (leaf in _LM_QUANT_TOP
                                              and len(keys) == 1)
        if target and w.ndim >= 2:
            if (mode in ("int4", "w4a8") and keys[0] == "layers"
                    and w.shape[-1] % groupsize == 0):
                if mode == "w4a8":
                    return quantize_weight_int4_packed(w, groupsize)
                return quantize_weight_int4(w, groupsize)
            return quantize_weight(w)
        if jnp.issubdtype(w.dtype, jnp.floating):
            return w.astype(jnp.bfloat16)
        return w

    return jax.tree_util.tree_map_with_path(visit, params)


def quantize_lm_params_incremental(params: dict, mode: str = "int8",
                                   groupsize: int = 128) -> dict:
    """quantize_lm_params, but one jitted call PER LEAF instead of one
    whole-tree program: the whole-tree jit at 4B needs ~9 GB of HLO temps
    beside ~8 GB of bf16 arguments and OOMs HBM — asynchronously on the
    remote runtime, surfacing as a RESOURCE_EXHAUSTED at the next host
    transfer. Per-leaf, the peak is one leaf's temps.

    DESTRUCTIVE: `params` (and its sub-dicts) are cleared so each bf16
    leaf frees as soon as its quantized form exists — rebind the result."""
    from functools import partial

    @partial(jax.jit, static_argnames=("m",))
    def one(w, m):
        fn = {"w4a8": lambda x: quantize_weight_int4_packed(x, groupsize),
              "int4": lambda x: quantize_weight_int4(x, groupsize),
              "int8": quantize_weight,
              "bf16": lambda x: x.astype(jnp.bfloat16)}[m]
        if m in ("w4a8", "int4") and w.ndim == 3:
            # layer-stacked leaf: lax.map over layers bounds the f32
            # upcast temps to one layer's slice (a whole (36, 9728, 2560)
            # leaf's f32 temp alone is ~3.6 GB)
            return jax.lax.map(fn, w)
        return fn(w)

    def visit(path, w):
        keys = [getattr(p, "key", None) for p in path]
        leaf = keys[-1]
        target = leaf in _LM_QUANT_LEAVES or (leaf in _LM_QUANT_TOP
                                              and len(keys) == 1)
        if target and w.ndim >= 2:
            if (mode in ("int4", "w4a8") and keys[0] == "layers"
                    and w.shape[-1] % groupsize == 0):
                return one(w, mode)
            return one(w, "int8")
        if jnp.issubdtype(w.dtype, jnp.floating):
            return one(w, "bf16")
        return w

    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat = list(flat)
    if isinstance(params, dict):
        params.clear()  # drop container refs: leaves now only held by flat
    out = []
    for i in range(len(flat)):
        path, w = flat[i]
        flat[i] = None  # free the processed leaf's last reference
        y = visit(path, w)
        del w
        # real host fetch, not block_until_ready: on remote-attached TPUs
        # block_until_ready can return before execution finishes, letting
        # per-leaf temps pile up in flight (transient HBM overshoot latches
        # an async RESOURCE_EXHAUSTED that surfaces much later)
        first = jax.tree_util.tree_leaves(y)[0]
        _ = np.asarray(first.reshape(-1)[0])
        out.append(y)
    return jax.tree_util.tree_unflatten(treedef, out)
