"""Device-resident autoregressive decode loop for the Dual-AR transformer.

Replaces the reference's eager python token loop
(/root/reference/fish_speech/models/text2semantic/inference.py:96-359) with a
single jitted program: prefill + `lax.while_loop` over decode steps, with the
KV cache, RAS window, sampled codes, RNG and stop flags all threaded as
device-resident state. The `im_end` stop check is a device-side flag (no host
sync per token; contrast ref inference.py:233).

Batching: prompts are LEFT-padded and right-aligned to a common length;
`start_offsets (B,)` marks each row's first real slot. RoPE positions are
shifted per row so every row sees positions 0..len-1, and the attention mask
excludes pad slots — equivalent to B independent unpadded decodes, which is
what makes multi-utterance batched serving a single pjit program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sampling import (
    RAS_WIN_SIZE,
    push_window,
    ras_select,
    sample_main_and_high,
    sample_one,
    greedy_one,
)
from .config import DualARConfig
from .dual_ar import (
    KVCache,
    forward_generate,
    forward_generate_fast,
    precompute_freqs_cis,
)


class SamplingConfig(NamedTuple):
    temperature: jax.Array  # f32 scalar or per-row (B,)
    top_p: jax.Array        # f32 scalar or per-row (B,)
    # optional per-row effective top-k (int32 scalar or (B,)) inside the
    # program's static top-k roof — exact for any k <= roof, so one
    # compiled tick serves requests with different top_k settings
    top_k_row: jax.Array | None = None

    @staticmethod
    def create(temperature: float = 0.7, top_p: float = 0.7) -> "SamplingConfig":
        return SamplingConfig(jnp.float32(temperature), jnp.float32(top_p))


class DecodeState(NamedTuple):
    cache: KVCache
    cur: jax.Array          # (B, K+1) last emitted column
    pos: jax.Array          # scalar int32 — next cache slot to write
    prev_window: jax.Array  # (B, RAS_WIN_SIZE) recent main tokens
    key: jax.Array          # PRNG key
    finished: jax.Array     # (B,) bool
    out: jax.Array          # (B, K+1, max_new) emitted columns
    step: jax.Array         # scalar int32
    lengths: jax.Array      # (B,) number of emitted columns before im_end


def _maybe_sample(key, logits, temperature, top_p, top_k, greedy,
                  top_k_row=None):
    if greedy:
        return greedy_one(logits)
    return sample_one(key, logits, temperature, top_p, top_k, top_k_row)


def decode_one_token(params: dict, cfg: DualARConfig, x: jax.Array,
                     cache: KVCache, input_pos: jax.Array,
                     freqs_table: jax.Array, fast_freqs_table: jax.Array,
                     bias: jax.Array, key: jax.Array, sampling: SamplingConfig,
                     prev_window: jax.Array | None, *, top_k: int,
                     greedy: bool, rope_positions: jax.Array | None = None,
                     key_valid_from: jax.Array | None = None,
                     sample_support: tuple | None = None,
                     sample_at: jax.Array | None = None):
    """One full Dual-AR step (ref inference.py:96-181).

    x: (B, K+1, T) — prompt on prefill (T>1) or last column (T=1).
    sample_support: optional static (semantic_begin, semantic_end, im_end) —
    logits/top-k/sampling run over only those rows (bit-identical to biasing
    the full vocab with -inf outside; 37x less logits work on the 4B model).
    The caller must guarantee `bias` is -inf outside the support (the
    standard semantic_logit_bias is).
    sample_at: optional traced column index to sample from instead of the
    last column (prefix-cached suffix prefill right-pads the block, so the
    last REAL column sits at a dynamic position).
    Returns (column (B, K+1) int32, new_cache).
    """
    b = x.shape[0]
    out = forward_generate(params, cfg, x, cache, input_pos, freqs_table,
                           rope_positions=rope_positions,
                           key_valid_from=key_valid_from,
                           logit_support=sample_support,
                           last_only=sample_at is None)
    if sample_at is None:
        logits_col = out.logits[:, -1, :]
        hidden = out.hidden[:, -1, :]
    else:
        logits_col = jax.lax.dynamic_index_in_dim(out.logits, sample_at, 1,
                                                  keepdims=False)
        hidden = jax.lax.dynamic_index_in_dim(out.hidden, sample_at, 1,
                                              keepdims=False)
    if sample_support is not None:
        sb, se, im = sample_support
        bias_r = jnp.concatenate([bias[sb:se + 1], bias[im:im + 1]])
        logits = logits_col.astype(jnp.float32) + bias_r
        n_sem = se - sb + 1
        unmap = lambda t: jnp.where(t == n_sem, jnp.int32(im),
                                    t + jnp.int32(sb)).astype(jnp.int32)
    else:
        logits = logits_col.astype(jnp.float32) + bias  # (B, V)
        unmap = lambda t: t

    tkr = getattr(sampling, "top_k_row", None)
    k_norm, k_fast = jax.random.split(key, 2)
    if prev_window is not None and not greedy:
        token_normal, token_high = sample_main_and_high(
            k_norm, logits, sampling.temperature, sampling.top_p, top_k, tkr)
        token = ras_select(unmap(token_normal), unmap(token_high), prev_window,
                           cfg.semantic_begin_id, cfg.semantic_end_id)
    else:
        # greedy: high-temp fallback would equal the normal draw, skip RAS
        token = unmap(_maybe_sample(k_norm, logits, sampling.temperature,
                                    sampling.top_p, top_k, greedy, tkr))

    if cfg.is_naive:
        # parallel codebook head (ref NaiveTransformer.decode, llama.py:626-639):
        # all K codebooks sampled at once from the slow hidden state
        from ..ops.quant import as_weight
        from .dual_ar import rms_norm

        cb = rms_norm(hidden, params["codebook_norm"], cfg.norm_eps)
        cb_logits = (cb @ as_weight(params["codebook_output"], cb.dtype).T)
        cb_logits = cb_logits.reshape(b * cfg.num_codebooks,
                                      cfg.codebook_size).astype(jnp.float32)
        if greedy:
            codes = greedy_one(cb_logits)
        else:
            temp = sampling.temperature
            top_p = sampling.top_p
            tkr_cb = tkr
            if jnp.ndim(temp) == 1:
                temp = jnp.repeat(temp, cfg.num_codebooks)
                top_p = jnp.repeat(top_p, cfg.num_codebooks)
            if tkr_cb is not None and jnp.ndim(tkr_cb) == 1:
                tkr_cb = jnp.repeat(tkr_cb, cfg.num_codebooks)
            codes = sample_one(k_fast, cb_logits, temp, top_p, top_k, tkr_cb)
        codes = codes.reshape(b, cfg.num_codebooks)
        column = jnp.concatenate([token[:, None], codes], axis=1)
        return column.astype(jnp.int32), out.cache

    # Fast head: prime position 0 with the slow hidden state, then emit the
    # residual codebooks autoregressively (ref inference.py:146-174).
    # int8 KV mode covers the fast cache too: its K sweeps re-read the whole
    # (L_f, B, H, K, D) cache every step (~2.6 GB/step at B=256), so halving
    # it is a direct bandwidth win on the same dequant-free attention path.
    fused_fast = "fast_packed" in params
    if fused_fast:
        from ..ops.fast_fused import FusedFastCache

        pad = 8  # Mosaic int8 tiling needs (local) batch % 8 == 0
        if cfg.tp_shards > 1:
            # the fused sweep batch-splits over the WHOLE mesh under TP
            from ..parallel.tp import get_decode_mesh

            mesh = get_decode_mesh()
            assert mesh is not None, "tp_shards > 1 needs decode_mesh(mesh)"
            pad = 8 * mesh.size
        fast_cache = FusedFastCache.create(cfg.n_fast_layer,
                                           cfg.num_codebooks,
                                           -(-b // pad) * pad, cfg.fast_dim)
    else:
        fast_kv_dtype = (jnp.int8 if cfg.kv_cache_dtype == "int8"
                         else out.hidden.dtype)
        fast_cache = KVCache.create(cfg.n_fast_layer, b, cfg.num_codebooks,
                                    cfg.fast_n_local_heads, cfg.fast_head_dim,
                                    dtype=fast_kv_dtype)
    # prime position 0: only the cache write matters (codebook 0 IS the
    # semantic token sampled above), so skip its fast_output projection
    unrolled_sweeps = cfg.unroll_fast_sweeps or fused_fast
    _, fast_cache = forward_generate_fast(
        params, cfg, hidden, fast_cache,
        0 if unrolled_sweeps else jnp.int32(0), fast_freqs_table,
        want_logits=False)
    code0 = jnp.clip(token - cfg.semantic_begin_id, 0, cfg.codebook_size - 1)

    def fast_step(carry, idx):
        prev_code, fcache, fkey = carry
        from ..ops.quant import take_rows

        emb = take_rows(params["fast_embeddings"], prev_code)
        logits_f, fcache = forward_generate_fast(params, cfg, emb, fcache,
                                                 idx, fast_freqs_table)
        fkey, sub = jax.random.split(fkey)
        code = _maybe_sample(sub, logits_f.astype(jnp.float32),
                             sampling.temperature, sampling.top_p, top_k,
                             greedy, tkr)
        return (code, fcache, fkey), code

    if unrolled_sweeps:
        # python-unrolled sweeps: static codebook positions fold the RoPE
        # slice and causal mask to constants, and attention reads only the
        # filled [0, idx] prefix of the fast cache (the scan form re-reads
        # all K positions every sweep). Same RNG split chain as the scan, so
        # the sampled stream is bit-identical.
        carry, rest = (code0, fast_cache, k_fast), []
        for idx in range(1, cfg.num_codebooks):
            carry, code = fast_step(carry, idx)
            rest.append(code)
        rest_codes = jnp.stack(rest)  # (K-1, B)
    else:
        (_, _, _), rest_codes = jax.lax.scan(
            fast_step, (code0, fast_cache, k_fast),
            jnp.arange(1, cfg.num_codebooks, dtype=jnp.int32))
    # rest_codes: (K-1, B) -> (B, K-1)
    column = jnp.concatenate(
        [token[:, None], code0[:, None], rest_codes.T], axis=1)
    return column.astype(jnp.int32), out.cache


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "top_k", "greedy",
                                   "im_end_id", "cache_len",
                                   "restrict_sampling"))
def generate(params: dict, cfg: DualARConfig, prompt: jax.Array,
             start_offsets: jax.Array, key: jax.Array,
             sampling: SamplingConfig, bias: jax.Array, *,
             max_new_tokens: int, im_end_id: int, top_k: int = 30,
             greedy: bool = False, cache_len: int | None = None,
             restrict_sampling: bool = True):
    """Prefill + decode loop, fully on device (ref inference.py:241-359).

    prompt: (B, K+1, T) int32, left-padded; start_offsets: (B,) first real slot.
    Returns (codes (B, K+1, max_new_tokens), lengths (B,)) where lengths counts
    columns before each row's im_end.
    restrict_sampling: compute logits/sampling over only the semantic range +
    im_end (exact under the standard semantic bias — pass False if `bias`
    permits tokens outside that support).
    """
    support = None
    if (restrict_sampling and cfg.semantic_begin_id is not None
            and cfg.semantic_end_id is not None):
        support = (cfg.semantic_begin_id, cfg.semantic_end_id, im_end_id)
    b, cb, t = prompt.shape
    s = cache_len or cfg.max_seq_len
    from .dual_ar import param_dtype

    dtype = (jnp.int8 if cfg.kv_cache_dtype == "int8"
             else param_dtype(params))
    cache = KVCache.create(cfg.n_layer, b, s, cfg.n_local_heads, cfg.head_dim,
                           dtype=dtype,
                           pos_major=cfg.kv_cache_layout == "pos")
    if cfg.tp_shards > 1:
        # pin the cache's decode sharding (batch over data, heads over
        # model) so GSPMD never materializes a resharding copy between the
        # in-program create and the shard_map'd kernels
        from jax.sharding import NamedSharding

        from ..parallel.mesh import kv_cache_spec
        from ..parallel.tp import get_decode_mesh

        mesh = get_decode_mesh()
        assert mesh is not None, "tp_shards > 1 needs decode_mesh(mesh)"
        spec = kv_cache_spec(cfg.kv_cache_layout, dtype == jnp.int8)
        cache = jax.tree.map(
            lambda x, sp: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, sp)), cache, spec)
    freqs_table = precompute_freqs_cis(s, cfg.head_dim, cfg.rope_base)
    fast_freqs_table = precompute_freqs_cis(cfg.num_codebooks, cfg.fast_head_dim,
                                            cfg.rope_base)

    rope_positions = jnp.maximum(
        jnp.arange(t, dtype=jnp.int32)[None, :] - start_offsets[:, None], 0)

    key, k_prefill = jax.random.split(key)
    first_col, cache = decode_one_token(
        params, cfg, prompt, cache, jnp.int32(0), freqs_table,
        fast_freqs_table, bias, k_prefill, sampling, None,
        top_k=top_k, greedy=greedy, rope_positions=rope_positions,
        key_valid_from=start_offsets, sample_support=support)

    prev_window = jnp.zeros((b, RAS_WIN_SIZE), dtype=jnp.int32)
    prev_window = push_window(prev_window, first_col[:, 0])

    out = jnp.zeros((b, cb, max_new_tokens), dtype=jnp.int32)
    out = out.at[:, :, 0].set(first_col)
    finished = first_col[:, 0] == im_end_id
    lengths = jnp.where(finished, 0, max_new_tokens)

    state = DecodeState(cache=cache, cur=first_col, pos=jnp.int32(t),
                        prev_window=prev_window, key=key, finished=finished,
                        out=out, step=jnp.int32(1), lengths=lengths)

    def cond(st: DecodeState):
        return (st.step < max_new_tokens) & ~jnp.all(st.finished)

    def body(st: DecodeState):
        key, sub = jax.random.split(st.key)
        rope_pos = (st.pos - start_offsets)[:, None]
        col, cache = decode_one_token(
            params, cfg, st.cur[:, :, None], st.cache, st.pos, freqs_table,
            fast_freqs_table, bias, sub, sampling, st.prev_window,
            top_k=top_k, greedy=greedy, rope_positions=rope_pos,
            key_valid_from=start_offsets, sample_support=support)
        now_finished = col[:, 0] == im_end_id
        lengths = jnp.where(now_finished & ~st.finished,
                            jnp.minimum(st.lengths, st.step), st.lengths)
        out = st.out.at[:, :, st.step].set(
            jnp.where(st.finished[:, None], st.out[:, :, st.step], col))
        return DecodeState(
            cache=cache, cur=col, pos=st.pos + 1,
            prev_window=push_window(st.prev_window, col[:, 0]),
            key=key, finished=st.finished | now_finished, out=out,
            step=st.step + 1, lengths=lengths)

    final = jax.lax.while_loop(cond, body, state)
    return final.out, final.lengths
