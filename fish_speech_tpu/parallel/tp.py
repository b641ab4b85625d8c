"""Tensor-parallel dispatch for the Pallas serving kernels.

The quantized serving fast path (int8 weights / W8A8 / position-major int8 KV
/ streaming decode attention / fused fast head) is built from hand-written
Pallas kernels, which GSPMD cannot partition automatically: each kernel must
be wrapped in `jax.shard_map` so every device runs the kernel on its local
shard of the KV cache / batch. This module holds

- the process-wide decode mesh registry (`decode_mesh` context manager):
  tracing `models/decode.py` under it routes the kernel call sites through
  the shard_map wrappers below;
- `stream_attention_tp`: streaming decode attention with the cache sharded
  (B over `data`, KV heads over `model`) — each device attends over its own
  heads, zero collectives (GQA is head-local);
- `fused_fast_sweep_tp`: the fused fast-head sweep batch-split over ALL mesh
  axes with replicated weights. The fast head is weight-bandwidth-bound, so
  sharding its ~400 MB of int8 weights would force a psum inside the fused
  kernel; splitting the batch instead keeps the kernel intact and removes
  the per-device activation work. Weights replicate (400 MB/chip).

The reference has no tensor parallelism at all — it delegates scale-out
serving to SGLang (/root/reference/README.md:130-137) and runs one model copy
per GPU process (/root/reference/tools/api_server.py:96-103).
"""

from __future__ import annotations

from contextlib import contextmanager
from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

_DECODE_MESH: list[Mesh | None] = [None]


def set_decode_mesh(mesh: Mesh | None) -> None:
    _DECODE_MESH[0] = mesh


def get_decode_mesh() -> Mesh | None:
    return _DECODE_MESH[0]


@contextmanager
def decode_mesh(mesh: Mesh | None):
    """Trace decode programs under this mesh. Any jit tracing that happens
    inside the context bakes the mesh into the program (cfg.tp_shards must
    match mesh.shape["model"] — asserted at the kernel call sites)."""
    prev = _DECODE_MESH[0]
    _DECODE_MESH[0] = mesh
    try:
        yield mesh
    finally:
        _DECODE_MESH[0] = prev


def _mesh_or_die(tp_shards: int) -> Mesh:
    mesh = get_decode_mesh()
    if mesh is None:
        raise RuntimeError(
            f"cfg.tp_shards={tp_shards} > 1 but no decode mesh is set — "
            "trace decode programs under parallel.tp.decode_mesh(mesh)")
    assert mesh.shape[MODEL_AXIS] == tp_shards, (
        f"cfg.tp_shards={tp_shards} != mesh model axis "
        f"{mesh.shape[MODEL_AXIS]}")
    return mesh


def stream_attention_tp(q, k_full, v_full, ks_full, vs_full, layer, lengths,
                        starts, *, rows: int, chunk: int, int8_scores: bool,
                        pos_major: bool, tp_shards: int):
    """`ops.attention.pallas_decode_attention_stream` over a sharded cache.

    Shardings: q (B, Hkv, G, D) — B over data, Hkv over model; pos-major
    cache (L, S, B, Hkv, D) likewise; int8 scales are the shard-blocked flat
    (L, B, tp * S*Hkv_local) layout (see models/dual_ar.py KVCache docs), so
    splitting the last axis over `model` hands each device exactly its local
    s-major flat. Attention is head-local under GQA, so the kernel output
    (B, Hkv, G, D) needs no collective; GSPMD gathers heads afterwards for
    the row-sharded wo matmul."""
    from ..ops.attention import pallas_decode_attention_stream

    mesh = _mesh_or_die(tp_shards)
    int8 = ks_full is not None
    if pos_major:
        kv_spec = P(None, None, DATA_AXIS, MODEL_AXIS, None)
        sc_spec = P(None, DATA_AXIS, MODEL_AXIS) if int8 else P()
    else:
        kv_spec = P(None, DATA_AXIS, MODEL_AXIS, None, None)
        sc_spec = P(None, DATA_AXIS, MODEL_AXIS, None) if int8 else P()
    q_spec = P(DATA_AXIS, MODEL_AXIS, None, None)

    body = partial(pallas_decode_attention_stream, rows=rows, chunk=chunk,
                   int8_scores=int8_scores, pos_major=pos_major)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, sc_spec, sc_spec, P(),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=q_spec, check_vma=False,
    )(q, k_full, v_full, ks_full, vs_full, layer, lengths, starts)


def blocks_attention_tp(q, k_full, v_full, ks_full, vs_full, layer, lengths,
                        starts, *, rows: int, chunk: int, int8_scores: bool,
                        tp_shards: int):
    """Head-major block-of-rows kernel, same sharding story as the stream
    wrapper (head-major only)."""
    from ..ops.attention import pallas_decode_attention_blocks

    mesh = _mesh_or_die(tp_shards)
    int8 = ks_full is not None
    kv_spec = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    sc_spec = P(None, DATA_AXIS, MODEL_AXIS, None) if int8 else P()
    q_spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    body = partial(pallas_decode_attention_blocks, rows=rows, chunk=chunk,
                   int8_scores=int8_scores)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, sc_spec, sc_spec, P(),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=q_spec, check_vma=False,
    )(q, k_full, v_full, ks_full, vs_full, layer, lengths, starts)


def fused_fast_sweep_tp(packed: dict, x, cache, freqs_table, *, pos: int,
                        n_head: int, eps: float, tp_shards: int):
    """`ops.fast_fused.fused_fast_sweep` batch-split over the whole mesh.

    x (B, dim) and every cache leaf's B axis split over (data, model);
    packed weights and the RoPE table replicate. The caller must pad B to a
    multiple of 8 * mesh.size (Mosaic's int8 tiling needs local B % 8 == 0;
    decode_one_token handles the padding)."""
    from ..ops.fast_fused import fused_fast_sweep

    mesh = _mesh_or_die(tp_shards)
    all_axes = (DATA_AXIS, MODEL_AXIS)
    w_spec = jax.tree.map(lambda _: P(), packed)
    cache_spec = type(cache)(*(P(None, None, all_axes, None)
                               for _ in range(4)))
    body = partial(fused_fast_sweep, pos=pos, n_head=n_head, eps=eps)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(w_spec, P(all_axes, None), cache_spec, P()),
        out_specs=(P(all_axes, None), cache_spec), check_vma=False,
    )(packed, x, cache, freqs_table)
