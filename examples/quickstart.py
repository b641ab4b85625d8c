"""Quickstart: end-to-end TTS with tiny random weights (no assets needed).

Run:  python examples/quickstart.py
Swap in real checkpoints with TTSEngine + convert_* (see docs/inference.md).
Mirrors the reference's inference.ipynb walkthrough.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from fish_speech_tpu.codec import init_dac_params, tiny_codec_config
from fish_speech_tpu.engine import GenerateLongRequest, TTSEngine
from fish_speech_tpu.models.config import DualARConfig
from fish_speech_tpu.models.init import init_dual_ar_params
from fish_speech_tpu.serve.wav import encode_wav
from fish_speech_tpu.text import ByteTokenizer

# 1. models (tiny, random — replace with converted reference checkpoints)
tok = ByteTokenizer(n_semantic=64)
cfg = DualARConfig(
    vocab_size=tok.vocab_size, n_layer=2, n_head=2, n_local_heads=2,
    dim=64, head_dim=32, intermediate_size=128, max_seq_len=1024,
    codebook_size=64, num_codebooks=4,
    semantic_begin_id=tok.semantic_begin_id,
    semantic_end_id=tok.semantic_end_id,
    n_fast_layer=1, fast_dim=64, fast_n_head=2, fast_n_local_heads=2,
    fast_head_dim=32, fast_intermediate_size=128)
params = init_dual_ar_params(jax.random.key(0), cfg)
codec_cfg = tiny_codec_config()
codec_params = init_dac_params(jax.random.key(1), codec_cfg)

engine = TTSEngine(params, cfg, tok, codec_params=codec_params,
                   codec_cfg=codec_cfg, cache_len=1024)

# 2. plain TTS
wav = engine.tts(GenerateLongRequest(
    text="<|speaker:0|>Hello from the TPU!", max_new_tokens=32, seed=0))
Path("quickstart.wav").write_bytes(encode_wav(wav, codec_cfg.sample_rate))
print(f"wrote quickstart.wav ({len(wav) / codec_cfg.sample_rate:.2f}s)")

# 3. voice cloning: reference audio -> codes -> conditioned generation
ref_wav = np.sin(np.linspace(0, 440 * 6.28, codec_cfg.frame_length * 4)
                 ).astype(np.float32)
ref_codes = engine.encode_reference(ref_wav)
wav2 = engine.tts(GenerateLongRequest(
    text="<|speaker:0|>Cloned!", max_new_tokens=16,
    prompt_text=["a tone"], prompt_tokens=[ref_codes], seed=1))
print(f"cloned: {len(wav2) / codec_cfg.sample_rate:.2f}s of audio")

# 4. streaming vocoder: chunks concatenate exactly to the full decode
from fish_speech_tpu.codec.streaming import StreamingVocoder

codes = engine.encode_reference(ref_wav)  # (codec codebooks, frames)
sv = StreamingVocoder(codec_params, codec_cfg, chunk_frames=2,
                      history_frames=8)
chunks = list(sv.feed(codes, final=True))
print(f"streamed {len(chunks)} chunks, "
      f"{sum(len(c) for c in chunks) / codec_cfg.sample_rate:.2f}s total")
