"""Device mesh + sharding rules (DP x TP) for the Dual-AR stack.

The reference scales only via DDP training and per-process model copies for
serving (ref configs/base.yaml:18-21, tools/api_server.py:96-103). The
TPU-native design instead uses one `jax.sharding.Mesh` with axes
`(data, model)`:

- utterance batches are data-parallel along `data`;
- the 4B slow decoder is tensor-parallel along `model`: attention heads and
  MLP hidden dims column/row-sharded, embeddings vocab-replicated, KV caches
  sharded over heads. XLA inserts the psum/all-gather collectives over ICI.

Rules are expressed as PartitionSpecs over our parameter pytree; the same
mesh (and specs) serve prefill, decode, the vocoder, and training.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1


def create_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(data=1, model=len(devices))
    assert cfg.data * cfg.model == devices.size, \
        f"mesh {cfg} does not cover {devices.size} devices"
    return Mesh(devices.reshape(cfg.data, cfg.model), (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Dual-AR parameter shardings
# ---------------------------------------------------------------------------

def dual_ar_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching models/init.py's layout.

    TP layout: wqkv column-sharded over heads (output dim), wo row-sharded
    (input dim); w1/w3 column-sharded, w2 row-sharded — the megatron pattern,
    one psum per attention + one per MLP, inserted by GSPMD.
    Embeddings/norms replicated (vocab dim is small relative to ICI cost of
    gathering logits; the lm_head matmul output is sharded over vocab via the
    embedding transpose when tied).
    """

    def stack_specs(layers: dict) -> dict:
        specs = {
            "attention": {
                "wqkv": P(None, MODEL_AXIS, None),
                "wo": P(None, None, MODEL_AXIS),
            },
            "feed_forward": {
                "w1": P(None, MODEL_AXIS, None),
                "w2": P(None, None, MODEL_AXIS),
                "w3": P(None, MODEL_AXIS, None),
            },
            "attention_norm": P(None, None),
            "ffn_norm": P(None, None),
        }
        attn = layers["attention"]
        if "wqkv_b" in attn:
            specs["attention"]["wqkv_b"] = P(None, MODEL_AXIS)
        if "wo_b" in attn:
            specs["attention"]["wo_b"] = P(None, None)
        if "q_norm" in attn:
            specs["attention"]["q_norm"] = P(None, None)
            specs["attention"]["k_norm"] = P(None, None)
        return specs

    specs = {
        k: v for k, v in {
            "embeddings": P(None, None),
            "codebook_embeddings": P(None, None),
            "norm": P(None),
            "fast_embeddings": P(None, None),
            "fast_norm": P(None),
            "fast_output": P(MODEL_AXIS, None),
        }.items() if k in params
    }
    if "layers" in params:
        specs["layers"] = stack_specs(params["layers"])
    if "fast_layers" in params:
        specs["fast_layers"] = stack_specs(params["fast_layers"])
    if "fast_packed" in params:
        # fused fast-head streaming pack (ops/fast_fused.py): replicated —
        # under TP the fused sweep batch-splits over the mesh with full
        # weights per device (the kernel is weight-streaming; sharding its
        # weights would need an in-kernel psum). ~400 MB int8 per chip.
        specs["fast_packed"] = jax.tree.map(lambda _: P(),
                                            params["fast_packed"])
    if "output" in params:
        specs["output"] = P(MODEL_AXIS, None)
    if "fast_project_in" in params:
        specs["fast_project_in"] = {"w": P(MODEL_AXIS, None), "b": P(MODEL_AXIS)}
    if "codebook_norm" in params:  # naive model head
        specs["codebook_norm"] = P(None)
    if "codebook_output" in params:
        specs["codebook_output"] = P(MODEL_AXIS, None)
    return _expand_quant_specs(params, specs)


def _expand_quant_specs(params: dict, specs: dict) -> dict:
    """Align the spec tree with quantized parameter pytrees: an int8 leaf is
    the subtree {"q": int8 (..., out, in), "s": f32 (..., out)} and int4 is
    {"q", "gs" (..., out, groups)} (ops/quant.py) — the weight spec applies
    to "q" verbatim, scales inherit it minus ("s") or including ("gs", same
    rank as q) the input-dim axis."""
    from ..ops.quant import is_quantized

    def expand(p, s):
        if is_quantized(p):
            if "q4" in p:
                # nibble-packed int4 (w4a8 serving form): byte j of the
                # packed inner/2 axis holds values j AND j+inner/2
                # (split-half), so a contiguous mesh split of that axis
                # does NOT line up with a contiguous activation shard —
                # replicate the packed axis; out-dim sharding stays.
                qs = P(*s[:-1], None)
                return {"q4": qs, "gs": qs}
            out = {"q": s}
            if "s" in p:
                out["s"] = P(*s[:-1])
            else:
                # groups axis replicated (tiny; sharding it would tie the
                # groupsize to the mesh shape)
                out["gs"] = P(*s[:-1], None)
            return out
        return s

    return jax.tree.map(expand, params, specs, is_leaf=is_quantized)


def shard_dual_ar_params(params: dict, mesh: Mesh) -> dict:
    specs = dual_ar_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def kv_cache_spec(layout: str = "head", int8: bool = False):
    """Spec pytree for a models.dual_ar.KVCache: batch over `data`, KV heads
    over `model`.

    head-major: k/v (L, B, Hkv, S, Dh), scales (L, B, Hkv, S).
    pos-major:  k/v (L, S, B, Hkv, Dh); int8 scales are the shard-blocked
    FLAT (L, B, tp * S*Hkv_local) layout (dual_ar.attention write path), so
    a model-axis split of the last dim hands each device its contiguous
    local s-major flat."""
    from ..models.dual_ar import KVCache

    if layout == "pos":
        kv = P(None, None, DATA_AXIS, MODEL_AXIS, None)
        sc = P(None, DATA_AXIS, MODEL_AXIS)
    else:
        kv = P(None, DATA_AXIS, MODEL_AXIS, None, None)
        sc = P(None, DATA_AXIS, MODEL_AXIS, None)
    if not int8:
        return KVCache(kv, kv)
    return KVCache(kv, kv, sc, sc)


def shard_kv_cache(cache, mesh: Mesh):
    """Place a KVCache with the decode shardings (see kv_cache_spec)."""
    from ..models.dual_ar import KVCache

    pos_major = cache.k.ndim == 5 and cache.ks is not None and \
        cache.ks.ndim == 3
    if cache.ks is None:
        # layout is ambiguous without scales: head-major is (L,B,Hkv,S,D),
        # pos-major (L,S,B,Hkv,D) — caller disambiguates via kv_cache_spec
        raise ValueError("use kv_cache_spec() + device_put for bf16 caches")
    spec = kv_cache_spec("pos" if pos_major else "head", int8=True)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, spec)


def shard_batch(x, mesh: Mesh):
    """Shard a batch-leading array over the data axis."""
    return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
