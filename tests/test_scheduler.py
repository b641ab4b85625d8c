"""Continuous-batching scheduler: overlapping requests must reproduce the
single-utterance decode exactly (greedy)."""

import numpy as np

import jax
import jax.numpy as jnp

from fish_speech_tpu.engine.scheduler import ContinuousBatcher, SchedulerThread, SlotRequest
from fish_speech_tpu.models.config import tiny_dual_ar_config
from fish_speech_tpu.models.decode import SamplingConfig, generate
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.ops.sampling import semantic_logit_bias

from ref_harness import random_lm_prompt

IM_END = 4


def _setup():
    cfg = tiny_dual_ar_config()
    params = init_dual_ar_params(jax.random.key(0), cfg)
    bias = semantic_logit_bias(cfg.vocab_size, cfg.semantic_begin_id,
                               cfg.semantic_end_id, IM_END)
    return cfg, params, bias


def _single(params, cfg, bias, prompt, max_new):
    codes, lengths = generate(
        params, cfg, jnp.asarray(prompt)[None], jnp.zeros((1,), jnp.int32),
        jax.random.key(0), SamplingConfig.create(), bias,
        max_new_tokens=max_new, im_end_id=IM_END, greedy=True, cache_len=128)
    n = int(lengths[0])
    return np.asarray(codes)[0, :, :n]


def test_batcher_matches_single_decodes():
    cfg, params, bias = _setup()
    rng = np.random.default_rng(0)
    prompts = [random_lm_prompt(cfg, t, rng) for t in (9, 14, 21)]
    max_new = 10

    singles = [_single(params, cfg, bias, p, max_new) for p in prompts]

    batcher = ContinuousBatcher(
        params, cfg, num_slots=2, cache_len=128, im_end_id=IM_END,
        bias=bias, greedy=True, prompt_bucket=32)
    reqs = [SlotRequest(request_id=i, prompt=p, max_new_tokens=max_new)
            for i, p in enumerate(prompts)]
    results = batcher.run(reqs)

    for i, want in enumerate(singles):
        got = results[i]
        n = want.shape[1]
        # batcher emits up to max_new columns without the trailing im_end;
        # single strips im_end via lengths — compare the common prefix
        assert got.shape[1] >= n, f"req {i}: {got.shape} vs {want.shape}"
        np.testing.assert_array_equal(got[:, :n], want)
        # and nothing after im_end should have been emitted
        assert got.shape[1] <= n + 1


def test_chunked_ticks_match_per_step():
    """step_chunk(n) must reproduce the step()-based run exactly (greedy:
    host-side RNG split order differs when assigns land on chunk
    boundaries, so only the deterministic stream is order-invariant)."""
    cfg, params, bias = _setup()
    rng = np.random.default_rng(3)
    prompts = [random_lm_prompt(cfg, t, rng) for t in (9, 14, 21)]
    max_new = 11  # not a multiple of the chunk: exercises mid-chunk budget

    def run(chunk):
        batcher = ContinuousBatcher(
            params, cfg, num_slots=2, cache_len=128, im_end_id=IM_END,
            bias=bias, greedy=True, prompt_bucket=32, seed=5)
        reqs = [SlotRequest(request_id=i, prompt=p, max_new_tokens=max_new)
                for i, p in enumerate(prompts)]
        return batcher.run(reqs, chunk_steps=chunk)

    per_step = run(1)
    chunked = run(4)
    for i in per_step:
        np.testing.assert_array_equal(chunked[i], per_step[i])


def test_scheduler_thread():
    cfg, params, bias = _setup()
    rng = np.random.default_rng(1)
    batcher = ContinuousBatcher(
        params, cfg, num_slots=2, cache_len=128, im_end_id=IM_END,
        bias=bias, greedy=True, prompt_bucket=32)
    sched = SchedulerThread(batcher)
    try:
        reqs = [SlotRequest(request_id=i,
                            prompt=random_lm_prompt(cfg, 8 + i, rng),
                            max_new_tokens=6)
                for i in range(4)]
        for r in reqs:
            sched.submit(r)
        for r in reqs:
            assert r.done.wait(timeout=120), "request did not finish"
            assert r.error is None
            assert len(r.result) >= 1
    finally:
        sched.stop()


def test_streaming_token_hook():
    cfg, params, bias = _setup()
    rng = np.random.default_rng(2)
    batcher = ContinuousBatcher(
        params, cfg, num_slots=1, cache_len=128, im_end_id=IM_END,
        bias=bias, greedy=True, prompt_bucket=32)
    seen = []
    req = SlotRequest(request_id=7, prompt=random_lm_prompt(cfg, 10, rng),
                      max_new_tokens=5,
                      on_token=lambda rid, col: seen.append((rid, col.copy())))
    out = batcher.run([req])
    assert len(seen) == out[7].shape[1]
    assert all(rid == 7 for rid, _ in seen)


def test_multihost_plan_roundtrip_and_apply():
    """TickPlan serialization + single-host apply path (the broadcast is a
    no-op with one process)."""
    from fish_speech_tpu.serve.multihost import (
        SlotAssignment, TickPlan, apply_plan, broadcast_plan)

    cfg, params, bias = _setup()
    rng = np.random.default_rng(9)
    batcher = ContinuousBatcher(
        params, cfg, num_slots=2, cache_len=128, im_end_id=IM_END,
        bias=bias, greedy=True, prompt_bucket=32)

    plan = TickPlan(assignments=[
        SlotAssignment(slot=0, request_id=1,
                       prompt=random_lm_prompt(cfg, 8, rng),
                       max_new_tokens=5, temperature=0.7, top_p=0.7)],
        n_ticks=4)
    restored = TickPlan.from_bytes(plan.to_bytes())
    assert restored.n_ticks == 4
    np.testing.assert_array_equal(restored.assignments[0].prompt,
                                  plan.assignments[0].prompt)

    same = broadcast_plan(plan)  # single-process no-op
    registry = {}
    apply_plan(batcher, same, registry)
    # 1 prefill column + up to 4 ticks emitted
    req = batcher.slot_req[0]
    if req is not None:
        assert len(req.result) >= 1


def test_prefix_cache_matches_full_prefill():
    """Requests sharing a voice-clone system prompt: the second assign must
    hit the prefix KV cache (no re-prefill of the shared prefix) and produce
    the same greedy stream as full prefill (VERDICT r1 item 7)."""
    cfg, params, bias = _setup()
    rng = np.random.default_rng(3)
    prefix = random_lm_prompt(cfg, 11, rng)          # shared system prompt
    suffixes = [random_lm_prompt(cfg, t, rng) for t in (5, 8, 5)]
    prompts = [np.concatenate([prefix, s], axis=1) for s in suffixes]
    max_new = 8

    # baseline: full prefill (no prefix marking)
    base = ContinuousBatcher(params, cfg, num_slots=2, cache_len=128,
                             im_end_id=IM_END, bias=bias, greedy=True,
                             prompt_bucket=16)
    base_out = base.run([SlotRequest(request_id=i, prompt=p,
                                     max_new_tokens=max_new)
                         for i, p in enumerate(prompts)])

    cached = ContinuousBatcher(params, cfg, num_slots=2, cache_len=128,
                               im_end_id=IM_END, bias=bias, greedy=True,
                               prompt_bucket=16)
    reqs = [SlotRequest(request_id=i, prompt=p, max_new_tokens=max_new,
                        prefix_id="voice-a", prefix_len=prefix.shape[1])
            for i, p in enumerate(prompts)]
    out = cached.run(reqs)

    assert cached.prefix_misses == 1, cached.prefix_misses
    assert cached.prefix_hits == 2, cached.prefix_hits
    for i in range(len(prompts)):
        np.testing.assert_array_equal(out[i], base_out[i])

    # a different prefix id must miss (and evict nothing at cap 8)
    other = np.concatenate([random_lm_prompt(cfg, 11, rng), suffixes[0]],
                           axis=1)
    cached.run([SlotRequest(request_id=99, prompt=other,
                            max_new_tokens=max_new, prefix_id="voice-b",
                            prefix_len=11)])
    assert cached.prefix_misses == 2


def test_batcher_pos_major_int8_stream():
    """Scheduler over the serving fast-path cache layout: position-major
    int8 KV + streaming kernel. Covers the layout-aware slot slicing in
    prefill (pos-major batch axis is 2) and prefix-cached assigns."""
    import dataclasses

    cfg, params, bias = _setup()
    cfg = dataclasses.replace(
        cfg, kv_cache_dtype="int8", kv_cache_layout="pos",
        use_pallas_attention=True, pallas_attn_block_rows=1,
        pallas_attn_stream=True, pallas_attn_int8_scores=False)
    rng = np.random.default_rng(4)
    prefix = random_lm_prompt(cfg, 9, rng)
    prompts = [np.concatenate([prefix, random_lm_prompt(cfg, t, rng)], axis=1)
               for t in (6, 4)]
    max_new = 6

    base = ContinuousBatcher(params, cfg, num_slots=2, cache_len=64,
                             im_end_id=IM_END, bias=bias, greedy=True,
                             prompt_bucket=16)
    base_out = base.run([SlotRequest(request_id=i, prompt=p,
                                     max_new_tokens=max_new)
                         for i, p in enumerate(prompts)])

    cached = ContinuousBatcher(params, cfg, num_slots=2, cache_len=64,
                               im_end_id=IM_END, bias=bias, greedy=True,
                               prompt_bucket=16)
    out = cached.run([SlotRequest(request_id=i, prompt=p,
                                  max_new_tokens=max_new, prefix_id="v",
                                  prefix_len=prefix.shape[1])
                      for i, p in enumerate(prompts)])
    assert cached.prefix_hits == 1
    for i in range(len(prompts)):
        np.testing.assert_array_equal(out[i], base_out[i])


def test_chunked_prefill_matches_monolithic():
    """A long prompt prefilled chunk-by-chunk (interleaved path) must emit
    the same greedy tokens as the monolithic prefill, and a concurrently
    decoding slot must keep making progress between chunks."""
    cfg, params, bias = _setup()
    rng = np.random.default_rng(7)
    long_prompt = random_lm_prompt(cfg, 40, rng)   # > prefill_chunk=16
    short_prompt = random_lm_prompt(cfg, 9, rng)
    max_new = 8

    mono = ContinuousBatcher(params, cfg, num_slots=2, cache_len=128,
                             im_end_id=IM_END, bias=bias, greedy=True,
                             prompt_bucket=16)
    want = mono.run([SlotRequest(request_id=0, prompt=long_prompt,
                                 max_new_tokens=max_new)])[0]

    chunked = ContinuousBatcher(params, cfg, num_slots=2, cache_len=128,
                                im_end_id=IM_END, bias=bias, greedy=True,
                                prompt_bucket=16, prefill_chunk=16)
    # drive manually: assign short first (starts decoding), then the long
    # one; assert the short slot's pos advances while prefill is pending
    r_short = SlotRequest(request_id=1, prompt=short_prompt,
                          max_new_tokens=max_new)
    r_long = SlotRequest(request_id=2, prompt=long_prompt,
                         max_new_tokens=max_new)
    chunked._assign(r_short, 0)
    chunked._assign(r_long, 1)
    assert chunked.prefill_pending()          # 40 > 16 -> chunked
    assert not chunked.active_h[1]            # not active until final chunk
    ticks_while_pending = 0
    while chunked.prefill_pending() or chunked.has_active():
        if chunked.prefill_pending():
            chunked.prefill_tick()
        if chunked.has_active():
            chunked.step()
            if chunked.prefill_pending():
                ticks_while_pending += 1
    assert ticks_while_pending >= 1  # short slot decoded between chunks

    got = np.stack(r_long.result, axis=1)
    n = min(want.shape[1], got.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
    assert abs(got.shape[1] - want.shape[1]) <= 1
    # short request also completed correctly vs its own single decode
    single_short = _single(params, cfg, bias, short_prompt, max_new)
    got_s = np.stack(r_short.result, axis=1)
    ns = single_short.shape[1]
    np.testing.assert_array_equal(got_s[:, :ns], single_short)


def test_chunked_prefill_recycled_slot():
    """Regression: a decode tick between prefill chunks must not scatter the
    recycled slot's stale (pos, cur) into cache rows an earlier chunk already
    wrote. Slot 0 first serves a short request (finishing at pos ~24, inside
    the next prompt's chunk-2 row range [16, 32)), then is recycled for a
    chunked long-prompt prefill while slot 1 keeps decoding — the interleaved
    ticks used to rewrite row `stale pos` of slot 0 every step."""
    cfg, params, bias = _setup()
    rng = np.random.default_rng(11)
    long_prompt = random_lm_prompt(cfg, 40, rng)   # 3 chunks of 16
    warm_prompt = random_lm_prompt(cfg, 9, rng)    # recycler: ends pos>=16
    bg_prompt = random_lm_prompt(cfg, 7, rng)      # keeps ticks flowing

    mono = ContinuousBatcher(params, cfg, num_slots=2, cache_len=128,
                             im_end_id=IM_END, bias=bias, greedy=True,
                             prompt_bucket=16)
    want = mono.run([SlotRequest(request_id=0, prompt=long_prompt,
                                 max_new_tokens=8)])[0]

    b = ContinuousBatcher(params, cfg, num_slots=2, cache_len=128,
                          im_end_id=IM_END, bias=bias, greedy=True,
                          prompt_bucket=16, prefill_chunk=16)
    r_warm = SlotRequest(request_id=1, prompt=warm_prompt, max_new_tokens=8)
    r_bg = SlotRequest(request_id=2, prompt=bg_prompt, max_new_tokens=60)
    b._assign(r_warm, 0)
    b._assign(r_bg, 1)
    # run slot 0's request to completion (slot 1 keeps going)
    while b.active_h[0]:
        b.step()
    stale_pos = int(jax.device_get(b.pos[0]))
    assert 16 <= stale_pos < 48, stale_pos  # inside the long prompt's rows
    assert b.active_h[1]                    # ticks will interleave

    r_long = SlotRequest(request_id=3, prompt=long_prompt, max_new_tokens=8)
    b._assign(r_long, 0)
    assert b.prefill_pending()

    # the sharp assertion: two chunks in, a decode tick (slot 1 is active)
    # must leave slot 0's already-prefilled rows [0, 32) bitwise untouched —
    # the unmasked scatter used to rewrite row `stale_pos` every tick
    from fish_speech_tpu.engine.scheduler import slice_slot_cache
    assert cfg.kv_cache_layout != "pos"  # row axis below assumes head-major
    b.prefill_tick()
    b.prefill_tick()
    before = np.asarray(jax.device_get(
        slice_slot_cache(b.cache, 0, pos_major=False).k))[..., :32, :]
    b.step()
    after = np.asarray(jax.device_get(
        slice_slot_cache(b.cache, 0, pos_major=False).k))[..., :32, :]
    np.testing.assert_array_equal(after, before)

    while b.prefill_pending() or b.active_h[0]:
        if b.prefill_pending():
            b.prefill_tick()
        if b.has_active():
            b.step()

    got = np.stack(r_long.result, axis=1)
    n = min(want.shape[1], got.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
    assert abs(got.shape[1] - want.shape[1]) <= 1


def test_cancel_active_slot_frees_within_one_tick():
    """cancel() on an active request frees its slot on the next tick and
    the surviving request's stream is unaffected (VERDICT r5 item 3)."""
    cfg, params, bias = _setup()
    rng = np.random.default_rng(11)
    prompts = [random_lm_prompt(cfg, t, rng) for t in (9, 14)]
    want = _single(params, cfg, bias, prompts[1], 10)

    batcher = ContinuousBatcher(
        params, cfg, num_slots=2, cache_len=128, im_end_id=IM_END,
        bias=bias, greedy=True, prompt_bucket=32)
    victim = SlotRequest(request_id=0, prompt=prompts[0], max_new_tokens=100)
    keeper = SlotRequest(request_id=1, prompt=prompts[1], max_new_tokens=10)
    batcher._assign(victim, 0)
    batcher._assign(keeper, 1)
    batcher.step()
    assert batcher.active_h[0] and batcher.active_h[1]

    victim.cancel()
    batcher.step()  # sweep runs at tick start: slot 0 freed this tick
    assert not batcher.active_h[0]
    assert 0 in batcher.free_slots()
    assert victim.done.is_set()
    assert batcher.cancelled_requests == 1
    assert not np.asarray(batcher.active)[0]  # device flag cleared too

    while batcher.active_h[1]:
        batcher.step()
    got = np.stack(keeper.result, axis=1)
    n = want.shape[1]
    np.testing.assert_array_equal(got[:, :n], want)


def test_cancel_inflight_chunked_prefill_and_queued():
    """Cancelling a request mid-chunked-prefill drops it and returns the
    reserved slot; cancelling a queued request never touches the device."""
    cfg, params, bias = _setup()
    rng = np.random.default_rng(12)
    long_prompt = random_lm_prompt(cfg, 40, rng)

    batcher = ContinuousBatcher(
        params, cfg, num_slots=1, cache_len=128, im_end_id=IM_END,
        bias=bias, greedy=True, prompt_bucket=32, prefill_chunk=8)
    req = SlotRequest(request_id=0, prompt=long_prompt, max_new_tokens=50)
    assert batcher._start_chunked(req, 0)
    batcher.prefill_tick()          # first chunk in flight
    assert batcher.prefill_pending()
    req.cancel()
    batcher.prefill_tick()          # sweep drops it before dispatch
    assert not batcher.prefill_pending()
    assert 0 in batcher.free_slots()
    assert req.done.is_set()

    # queued cancellation via the scheduler thread
    thread = SchedulerThread(batcher)
    try:
        q = SlotRequest(request_id=1, prompt=long_prompt[:, :10],
                        max_new_tokens=5)
        q.cancel()
        thread.submit(q)
        assert q.done.wait(timeout=30)
        assert not q.result
    finally:
        thread.stop()


def test_per_request_top_k_one_matches_greedy():
    """A sampled request with top_k=1 must reproduce the greedy stream —
    proves the per-slot top_k device mask reaches the tick program (the
    scheduler used to bake a fixed top_k=30 into its programs)."""
    cfg, params, bias = _setup()
    rng = np.random.default_rng(13)
    prompt = random_lm_prompt(cfg, 12, rng)
    max_new = 12
    want = _single(params, cfg, bias, prompt, max_new)

    batcher = ContinuousBatcher(
        params, cfg, num_slots=2, cache_len=128, im_end_id=IM_END,
        bias=bias, greedy=False, prompt_bucket=32, seed=9)
    # temperature 1.0 makes a 30-candidate sampled stream diverge from
    # greedy almost surely; top_k=1 collapses it back to argmax exactly
    reqs = [SlotRequest(request_id=0, prompt=prompt, max_new_tokens=max_new,
                        temperature=1.0, top_p=1.0, top_k=1),
            SlotRequest(request_id=1, prompt=prompt, max_new_tokens=max_new,
                        temperature=1.0, top_p=1.0, top_k=30)]
    results = batcher.run(reqs)
    got = results[0]
    n = want.shape[1]
    assert got.shape[1] >= n
    np.testing.assert_array_equal(got[:, :n], want)
