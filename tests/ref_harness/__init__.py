"""Golden-generation harness: runs the *actual reference code* at
/root/reference under torch-CPU to produce parity goldens.

The reference depends on packages absent from this image (descript-audio-codec,
audiotools, loguru, loralib). We install minimal, faithful stand-ins in
sys.modules before importing it. The `dac` quantizer/layers stand-ins replicate
the public descript-audio-codec v1.0 semantics (Snake, weight-normed convs,
L2-normalized nearest-neighbour RVQ) — these define golden numerics, so they
live here in the test harness, never in the framework itself.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"

_loaded = False


def _install_loguru():
    mod = types.ModuleType("loguru")

    class _Logger:
        def __getattr__(self, name):
            def _noop(*a, **k):
                pass
            return _noop

    mod.logger = _Logger()
    sys.modules["loguru"] = mod


def _install_loralib():
    import torch.nn as nn

    mod = types.ModuleType("loralib")

    class Embedding(nn.Embedding):
        def __init__(self, num_embeddings, embedding_dim, r=0, lora_alpha=1,
                     padding_idx=None, **kw):
            super().__init__(num_embeddings, embedding_dim, padding_idx=padding_idx)

    class Linear(nn.Linear):
        def __init__(self, in_features, out_features, bias=True, r=0,
                     lora_alpha=1, lora_dropout=0.0, **kw):
            super().__init__(in_features, out_features, bias=bias)

    def mark_only_lora_as_trainable(model, bias="none"):
        pass

    mod.Embedding = Embedding
    mod.Linear = Linear
    mod.mark_only_lora_as_trainable = mark_only_lora_as_trainable
    sys.modules["loralib"] = mod


def _install_audiotools():
    import torch.nn as nn

    at = types.ModuleType("audiotools")
    at_ml = types.ModuleType("audiotools.ml")

    class AudioSignal:  # placeholder, unused in the paths we exercise
        pass

    class BaseModel(nn.Module):
        pass

    at.AudioSignal = AudioSignal
    at_ml.BaseModel = BaseModel
    at.ml = at_ml
    sys.modules["audiotools"] = at
    sys.modules["audiotools.ml"] = at_ml


def _install_dac():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from einops import rearrange
    from torch.nn.utils.parametrizations import weight_norm

    dac_mod = types.ModuleType("dac")
    model_mod = types.ModuleType("dac.model")
    base_mod = types.ModuleType("dac.model.base")
    nn_mod = types.ModuleType("dac.nn")
    layers_mod = types.ModuleType("dac.nn.layers")
    quant_mod = types.ModuleType("dac.nn.quantize")

    class CodecMixin:
        def get_delay(self):
            return 0

    def WNConv1d(*args, **kwargs):
        return weight_norm(nn.Conv1d(*args, **kwargs))

    def WNConvTranspose1d(*args, **kwargs):
        return weight_norm(nn.ConvTranspose1d(*args, **kwargs))

    class Snake1d(nn.Module):
        def __init__(self, channels):
            super().__init__()
            self.alpha = nn.Parameter(torch.ones(1, channels, 1))

        def forward(self, x):
            shape = x.shape
            x = x.reshape(shape[0], shape[1], -1)
            x = x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)
            return x.reshape(shape)

    class VectorQuantize(nn.Module):
        def __init__(self, input_dim, codebook_size, codebook_dim):
            super().__init__()
            self.codebook_size = codebook_size
            self.codebook_dim = codebook_dim
            self.in_proj = WNConv1d(input_dim, codebook_dim, kernel_size=1)
            self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)
            self.codebook = nn.Embedding(codebook_size, codebook_dim)

        def embed_code(self, embed_id):
            return F.embedding(embed_id, self.codebook.weight)

        def decode_code(self, embed_id):
            return self.embed_code(embed_id).transpose(1, 2)

        def decode_latents(self, latents):
            encodings = rearrange(latents, "b d t -> (b t) d")
            codebook = self.codebook.weight
            encodings = F.normalize(encodings)
            codebook = F.normalize(codebook)
            dist = (
                encodings.pow(2).sum(1, keepdim=True)
                - 2 * encodings @ codebook.t()
                + codebook.pow(2).sum(1, keepdim=True).t()
            )
            indices = rearrange((-dist).max(1)[1], "(b t) -> b t", b=latents.size(0))
            z_q = self.decode_code(indices)
            return z_q, indices

        def forward(self, z):
            z_e = self.in_proj(z)
            z_q, indices = self.decode_latents(z_e)
            commitment_loss = F.mse_loss(z_e, z_q.detach(), reduction="none").mean([1, 2])
            codebook_loss = F.mse_loss(z_q, z_e.detach(), reduction="none").mean([1, 2])
            z_q = z_e + (z_q - z_e).detach()
            z_q = self.out_proj(z_q)
            return z_q, commitment_loss, codebook_loss, indices, z_e

    class ResidualVectorQuantize(nn.Module):
        def __init__(self, input_dim=512, n_codebooks=9, codebook_size=1024,
                     codebook_dim=8, quantizer_dropout=0.0):
            super().__init__()
            if isinstance(codebook_dim, int):
                codebook_dim = [codebook_dim for _ in range(n_codebooks)]
            self.n_codebooks = n_codebooks
            self.codebook_dim = codebook_dim
            self.codebook_size = codebook_size
            self.quantizers = nn.ModuleList(
                [VectorQuantize(input_dim, codebook_size, codebook_dim[i])
                 for i in range(n_codebooks)]
            )
            self.quantizer_dropout = quantizer_dropout

        def forward(self, z, n_quantizers=None):
            z_q = 0
            residual = z
            commitment_loss = 0
            codebook_loss = 0
            codebook_indices = []
            latents = []
            if n_quantizers is None:
                n_quantizers = self.n_codebooks
            for i, quantizer in enumerate(self.quantizers):
                if self.training is False and i >= n_quantizers:
                    break
                z_q_i, commit_i, cb_i, indices_i, z_e_i = quantizer(residual)
                mask = torch.full((z.shape[0],), fill_value=i, device=z.device) < n_quantizers
                z_q = z_q + z_q_i * mask[:, None, None]
                residual = residual - z_q_i
                commitment_loss = commitment_loss + (commit_i * mask).mean()
                codebook_loss = codebook_loss + (cb_i * mask).mean()
                codebook_indices.append(indices_i)
                latents.append(z_e_i)
            codes = torch.stack(codebook_indices, dim=1)
            latents = torch.cat(latents, dim=1)
            return z_q, codes, latents, commitment_loss, codebook_loss

        def from_codes(self, codes):
            z_q = 0.0
            z_p = []
            n_codebooks = codes.shape[1]
            for i in range(n_codebooks):
                z_p_i = self.quantizers[i].decode_code(codes[:, i, :])
                z_p.append(z_p_i)
                z_q_i = self.quantizers[i].out_proj(z_p_i)
                z_q = z_q + z_q_i
            return z_q, torch.cat(z_p, dim=1), codes

    base_mod.CodecMixin = CodecMixin
    layers_mod.Snake1d = Snake1d
    layers_mod.WNConv1d = WNConv1d
    layers_mod.WNConvTranspose1d = WNConvTranspose1d
    quant_mod.VectorQuantize = VectorQuantize
    quant_mod.ResidualVectorQuantize = ResidualVectorQuantize

    dac_mod.model = model_mod
    dac_mod.nn = nn_mod
    model_mod.base = base_mod
    nn_mod.layers = layers_mod
    nn_mod.quantize = quant_mod

    sys.modules["dac"] = dac_mod
    sys.modules["dac.model"] = model_mod
    sys.modules["dac.model.base"] = base_mod
    sys.modules["dac.nn"] = nn_mod
    sys.modules["dac.nn.layers"] = layers_mod
    sys.modules["dac.nn.quantize"] = quant_mod


def load_reference():
    """Install stubs + put /root/reference on sys.path. Idempotent."""
    global _loaded
    if _loaded:
        return
    _install_loguru()
    _install_loralib()
    _install_audiotools()
    _install_dac()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _loaded = True


def state_dict_numpy(module) -> dict:
    """torch module -> {name: float32 numpy} state dict."""
    return {k: v.detach().float().numpy() for k, v in module.state_dict().items()}


def random_lm_prompt(cfg, t: int, rng):
    """(K+1, T) prompt mixing text tokens and semantic rows (shared between
    golden generation and tests)."""
    import numpy as np

    tokens = rng.integers(0, cfg.vocab_size, size=(t,))
    sem = rng.integers(cfg.semantic_begin_id, cfg.semantic_end_id + 1,
                       size=(t - t // 2,))
    tokens[t // 2:] = sem
    codes = rng.integers(0, cfg.codebook_size, size=(cfg.num_codebooks, t))
    codes[:, : t // 2] = 0
    return np.concatenate([tokens[None], codes], axis=0).astype(np.int32)
