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
        "embeddings": P(None, None),
        "codebook_embeddings": P(None, None),
        "layers": stack_specs(params["layers"]),
        "norm": P(None),
        "fast_embeddings": P(None, None),
        "fast_layers": stack_specs(params["fast_layers"]),
        "fast_norm": P(None),
        "fast_output": P(MODEL_AXIS, None),
    }
    if "output" in params:
        specs["output"] = P(MODEL_AXIS, None)
    if "fast_project_in" in params:
        specs["fast_project_in"] = {"w": P(MODEL_AXIS, None), "b": P(MODEL_AXIS)}
    return specs


def shard_dual_ar_params(params: dict, mesh: Mesh) -> dict:
    specs = dual_ar_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def kv_cache_spec() -> P:
    """(L, B, H_kv, S, Dh): batch over data, heads over model."""
    return P(None, DATA_AXIS, MODEL_AXIS, None, None)


def shard_batch(x, mesh: Mesh):
    """Shard a batch-leading array over the data axis."""
    return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
