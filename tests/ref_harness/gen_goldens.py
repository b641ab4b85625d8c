"""Generate parity goldens from the reference implementation (slow: builds the
real reference modules under torch-CPU) into tests/goldens/*.npz.

Run:  python tests/ref_harness/gen_goldens.py
The .npz files are committed so the regular test suite never needs torch or
the reference tree. Regenerate if reference-parity semantics change.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"

TESTS_DIR = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(TESTS_DIR))
sys.path.insert(0, str(TESTS_DIR.parent))

from ref_harness import random_lm_prompt, state_dict_numpy  # noqa: E402

GOLDEN_DIR = TESTS_DIR / "goldens"
IM_END_ID = 4


def gen_codec():
    import torch
    from ref_harness.codec_builder import build_reference_dac
    from fish_speech_tpu.codec import tiny_codec_config

    cfg = tiny_codec_config()
    ref = build_reference_dac(cfg)
    sd = state_dict_numpy(ref)

    rng = np.random.default_rng(0)
    n_q = cfg.rvq.total_codebooks
    codes1 = np.concatenate(
        [rng.integers(0, cfg.rvq.semantic_codebook_size, size=(2, 1, 11)),
         rng.integers(0, cfg.rvq.codebook_size, size=(2, n_q - 1, 11))],
        axis=1).astype(np.int32)
    rng = np.random.default_rng(1)
    codes2 = np.concatenate(
        [rng.integers(0, cfg.rvq.semantic_codebook_size, size=(1, 1, 9)),
         rng.integers(0, cfg.rvq.codebook_size, size=(1, n_q - 1, 9))],
        axis=1).astype(np.int32)
    rng = np.random.default_rng(2)
    t_samples = 5 * cfg.frame_length + 37
    wav = (0.3 * rng.standard_normal((1, t_samples))).astype(np.float32)

    with torch.no_grad():
        golden_audio = ref.from_indices(torch.from_numpy(codes1).long()).numpy()
        golden_z = ref.quantizer.decode(torch.from_numpy(codes2).long()).numpy()
        golden_codes, golden_lens = ref.encode(
            torch.from_numpy(wav)[:, None, :],
            torch.tensor([t_samples], dtype=torch.long))

    out = {f"sd:{k}": v for k, v in sd.items()}
    out.update(codes1=codes1, golden_audio=golden_audio,
               codes2=codes2, golden_z=golden_z,
               wav=wav, golden_codes=golden_codes.numpy().astype(np.int32),
               golden_lens=golden_lens.numpy().astype(np.int32))
    np.savez_compressed(GOLDEN_DIR / "codec_tiny.npz", **out)
    print("codec_tiny.npz written:", len(sd), "tensors")


def gen_lm():
    import torch
    from ref_harness.lm_builder import build_reference_dual_ar, reference_greedy_decode
    from fish_speech_tpu.models.config import tiny_dual_ar_config

    cfg = tiny_dual_ar_config()
    ref = build_reference_dual_ar(cfg)
    sd = state_dict_numpy(ref)

    rng = np.random.default_rng(0)
    prompt = random_lm_prompt(cfg, 24, rng)[None]
    with torch.no_grad():
        golden = ref(torch.from_numpy(prompt).long(),
                     labels=torch.from_numpy(prompt).long())

    rng = np.random.default_rng(1)
    prompt2 = random_lm_prompt(cfg, 16, rng)
    golden_stream = reference_greedy_decode(ref, prompt2, 24, IM_END_ID)

    out = {f"sd:{k}": v for k, v in sd.items()}
    out.update(prompt=prompt,
               golden_token_logits=golden.token_logits.numpy(),
               golden_codebook_logits=golden.codebook_logits.numpy(),
               prompt2=prompt2, golden_stream=golden_stream.astype(np.int32))
    np.savez_compressed(GOLDEN_DIR / "lm_tiny.npz", **out)
    print("lm_tiny.npz written:", len(sd), "tensors")


def gen_naive():
    import torch
    import dataclasses as dc
    from ref_harness import load_reference, random_lm_prompt, state_dict_numpy
    from fish_speech_tpu.models.config import tiny_dual_ar_config

    load_reference()
    from fish_speech.models.text2semantic.llama import NaiveModelArgs, NaiveTransformer

    cfg = dc.replace(tiny_dual_ar_config(), model_type="naive")
    args = NaiveModelArgs(
        vocab_size=cfg.vocab_size, n_layer=cfg.n_layer, n_head=cfg.n_head,
        n_local_heads=cfg.n_local_heads, dim=cfg.dim, head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size, max_seq_len=cfg.max_seq_len,
        codebook_size=cfg.codebook_size, num_codebooks=cfg.num_codebooks,
        semantic_begin_id=cfg.semantic_begin_id,
        semantic_end_id=cfg.semantic_end_id,
        use_gradient_checkpointing=False)
    torch.manual_seed(7)
    model = NaiveTransformer(args)
    model.eval()
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            if "norm" in name and "weight" in name:
                p.add_(0.05 * torch.randn_like(p))
            else:
                p.copy_(0.05 * torch.randn_like(p))

    sd = state_dict_numpy(model)
    rng = np.random.default_rng(4)
    prompt = random_lm_prompt(cfg, 18, rng)[None]
    with torch.no_grad():
        golden = model(torch.from_numpy(prompt).long())
    out = {f"sd:{k}": v for k, v in sd.items()}
    out.update(prompt=prompt,
               golden_token_logits=golden.token_logits.numpy(),
               golden_codebook_logits=golden.codebook_logits.numpy())
    np.savez_compressed(GOLDEN_DIR / "lm_naive.npz", **out)
    print("lm_naive.npz written:", len(sd), "tensors")


if __name__ == "__main__":
    GOLDEN_DIR.mkdir(exist_ok=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "codec"):
        gen_codec()
    if which in ("all", "lm"):
        gen_lm()
    if which in ("all", "naive"):
        gen_naive()
