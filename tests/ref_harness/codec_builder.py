"""Build reference (torch) codec models from a fish_speech_tpu DACConfig,
mirroring the hydra wiring of /root/reference/fish_speech/configs/
modded_dac_vq.yaml, for golden generation."""

from __future__ import annotations

import functools

from . import load_reference
from fish_speech_tpu.codec.config import DACConfig


def build_reference_dac(cfg: DACConfig):
    load_reference()
    import torch
    from fish_speech.models.dac.modded_dac import DAC, ModelArgs, WindowLimitedTransformer
    from fish_speech.models.dac.rvq import DownsampleResidualVectorQuantize

    t = cfg.rvq.pre_post_transformer

    def make_pre_post():
        return WindowLimitedTransformer(
            causal=True,
            window_size=t.window_size,
            input_dim=cfg.rvq.input_dim,
            config=ModelArgs(
                block_size=2048,
                n_layer=t.n_layer,
                n_head=t.n_head,
                dim=t.dim,
                intermediate_size=t.intermediate_size,
                n_local_heads=-1,
                head_dim=t.head_dim,
                rope_base=t.rope_base,
                norm_eps=t.norm_eps,
                dropout_rate=0.1,
                attn_dropout_rate=0.1,
                channels_first=True,
            ),
        )

    quantizer = DownsampleResidualVectorQuantize(
        input_dim=cfg.rvq.input_dim,
        n_codebooks=cfg.rvq.n_codebooks,
        codebook_size=cfg.rvq.codebook_size,
        codebook_dim=cfg.rvq.codebook_dim,
        quantizer_dropout=0.5,
        downsample_factor=list(cfg.rvq.downsample_factor),
        semantic_codebook_size=cfg.rvq.semantic_codebook_size,
        pre_module=make_pre_post(),
        post_module=make_pre_post(),
    )

    # general config partial: note window_size is NOT a partial attribute, so
    # encoder blocks fall back to 512 (modded_dac.py:641) — matched by
    # cfg.encoder_transformer_window
    general = functools.partial(
        ModelArgs,
        block_size=8192,
        n_local_heads=-1,
        head_dim=64,
        rope_base=10000,
        norm_eps=1e-5,
        dropout_rate=0.1,
        attn_dropout_rate=0.1,
        channels_first=True,
    )

    model = DAC(
        encoder_dim=cfg.encoder_dim,
        encoder_rates=list(cfg.encoder_rates),
        decoder_dim=cfg.decoder_dim,
        decoder_rates=list(cfg.decoder_rates),
        quantizer=quantizer,
        sample_rate=cfg.sample_rate,
        causal=cfg.causal,
        encoder_transformer_layers=list(cfg.encoder_transformer_layers),
        decoder_transformer_layers=list(cfg.decoder_transformer_layers),
        transformer_general_config=general,
    )
    model.eval()
    torch.manual_seed(0)
    # randomize all params deterministically (default init is mostly zeros/ones
    # for some leaves; give everything a non-trivial value for a strong test)
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            if "alpha" in name or "norm" in name or "gamma" in name \
                    or name.endswith("original0"):
                # keep norm/gain-like params near their nominal scale, but
                # perturb so mismatched wiring cannot hide
                p.add_(0.05 * torch.randn_like(p))
            else:
                p.copy_(0.05 * torch.randn_like(p))
    return model
