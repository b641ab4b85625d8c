"""fish_speech_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Dual-AR TTS framework.

Re-designed from scratch with the capabilities of fish-speech (Fish Audio S2
Pro): a Dual-AR transformer (slow token-level decoder + fast residual-codebook
head) emitting RVQ audio codes, and a modded-DAC codec/vocoder (10 codebooks @
~21.5 Hz, 44.1 kHz) turning codes into waveforms.

Layout:
  codec/     — modded-DAC codec: causal convs, RVQ, window-limited transformer
  models/    — Dual-AR transformer (slow + fast stacks), KV-cache decode
  ops/       — Pallas TPU kernels + XLA fused ops (attention, sampling, norms)
  parallel/  — jax.sharding Mesh + partition specs (DP x TP)
  text/      — tokenizer, content-sequence / conversation prompt encoding
  engine/    — generation runtime (chunked long-text driver, streaming)
  train/     — training step, losses, optimizer, LoRA, datasets
  serve/     — HTTP serving layer
  data/      — dataset build tooling (protobuf stream format)
  utils/     — spectrogram, audio io, misc
"""

__version__ = "0.1.0"
