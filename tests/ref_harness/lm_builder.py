"""Build the reference (torch) DualARTransformer from a fish_speech_tpu
DualARConfig for golden generation, and drive its decode loop
deterministically (greedy, RAS disabled)."""

from __future__ import annotations

import numpy as np

from . import load_reference
from fish_speech_tpu.models.config import DualARConfig


def build_reference_dual_ar(cfg: DualARConfig, seed: int = 0):
    load_reference()
    import torch
    from fish_speech.models.text2semantic.llama import DualARModelArgs, DualARTransformer

    args = DualARModelArgs(
        model_type="dual_ar",
        vocab_size=cfg.vocab_size,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        n_local_heads=cfg.n_local_heads,
        dim=cfg.dim,
        head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size,
        rope_base=cfg.rope_base,
        norm_eps=cfg.norm_eps,
        max_seq_len=cfg.max_seq_len,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_qkv_bias=cfg.attention_qkv_bias,
        attention_o_bias=cfg.attention_o_bias,
        attention_qk_norm=cfg.attention_qk_norm,
        codebook_size=cfg.codebook_size,
        num_codebooks=cfg.num_codebooks,
        semantic_begin_id=cfg.semantic_begin_id,
        semantic_end_id=cfg.semantic_end_id,
        scale_codebook_embeddings=cfg.scale_codebook_embeddings,
        n_fast_layer=cfg.n_fast_layer,
        fast_dim=cfg.fast_dim,
        fast_n_head=cfg.fast_n_head,
        fast_n_local_heads=cfg.fast_n_local_heads,
        fast_head_dim=cfg.fast_head_dim,
        fast_intermediate_size=cfg.fast_intermediate_size,
        norm_fastlayer_input=cfg.norm_fastlayer_input,
        use_gradient_checkpointing=False,
    )
    torch.manual_seed(seed)
    model = DualARTransformer(args)
    model.eval()
    # strengthen init for a sharper parity signal
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            if "norm" in name and "weight" in name:
                p.add_(0.05 * torch.randn_like(p))
            else:
                p.copy_(0.05 * torch.randn_like(p))
    return model


def reference_greedy_decode(model, prompt: np.ndarray, num_new_tokens: int,
                            im_end_id: int) -> np.ndarray:
    """Drive the reference decode_one_token_ar greedily (temperature->0, RAS
    off) — mirrors inference.py:241-359 without the sampling randomness.
    prompt: (K+1, T). Returns (K+1, emitted) including a trailing im_end if
    hit."""
    import torch
    from fish_speech.models.text2semantic.inference import decode_one_token_ar

    device = "cpu"
    model.setup_caches(max_batch_size=1, max_seq_len=model.config.max_seq_len,
                       dtype=torch.float32)
    temperature = torch.tensor(1e-6, dtype=torch.float32)
    top_p = torch.tensor(1.0, dtype=torch.float32)
    vocab = model.config.vocab_size
    bias = torch.full((1, 1, vocab), float("-inf"))
    bias[0, 0, model.config.semantic_begin_id: model.config.semantic_end_id + 1] = 0
    bias[0, 0, im_end_id] = 0

    prompt_t = torch.from_numpy(prompt).long()[None]  # (1, K+1, T)
    t = prompt.shape[1]
    with torch.no_grad():
        input_pos = torch.arange(0, t, device=device)
        cur = decode_one_token_ar(
            model, prompt_t, input_pos, temperature, top_p, 30, bias,
            audio_masks=None, audio_parts=None, previous_tokens=None)
        cols = [cur.clone()]
        input_pos = torch.tensor([t], dtype=torch.long)
        for _ in range(num_new_tokens - 1):
            if cols[-1][0, 0] == im_end_id:
                break
            cur = decode_one_token_ar(
                model, cols[-1].view(1, -1, 1), input_pos, temperature, top_p,
                30, bias, audio_masks=None, audio_parts=None,
                previous_tokens=None)
            cols.append(cur.clone())
            input_pos += 1
    return torch.cat(cols, dim=1).numpy()
