"""Checkpoint IO: our safetensors layout + reference-torch ingestion.

Our native format: a directory with `config.json` + `model.safetensors`
holding the parameter pytree flattened with '/'-joined keys (list indices as
numbers). Loading reference checkpoints mirrors
/root/reference/fish_speech/models/text2semantic/llama.py:545-587 (sharded or
single safetensors, fish_qwen3_omni key remap, .pth via torch when present).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [fix(node[str(i)]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_params(path: str | Path, params: dict, config=None) -> None:
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    # safetensors has no int4: widen to int8 and record which keys to narrow
    int4_keys = [k for k, v in flat.items() if str(v.dtype) == "int4"]
    if int4_keys:
        flat = {k: (v.astype(np.int8) if k in int4_keys else v)
                for k, v in flat.items()}
        (path / "quant_meta.json").write_text(json.dumps(
            {"int4_keys": int4_keys}))
    save_file(flat, str(path / "model.safetensors"))
    if config is not None:
        import dataclasses

        cfg_dict = (dataclasses.asdict(config)
                    if dataclasses.is_dataclass(config) else dict(config))
        (path / "config.json").write_text(json.dumps(cfg_dict, indent=2))


def load_params(path: str | Path, dtype=None):
    from safetensors.numpy import load_file

    path = Path(path)
    flat = load_file(str(path / "model.safetensors"))
    meta_file = path / "quant_meta.json"
    int4_keys = (set(json.loads(meta_file.read_text()).get("int4_keys", []))
                 if meta_file.exists() else set())
    def restore(k, v):
        if k in int4_keys:
            return jnp.asarray(v, dtype=jnp.int4)
        if dtype is not None and np.issubdtype(v.dtype, np.floating):
            return jnp.asarray(v, dtype=dtype)  # never recast int8 q-values
        return jnp.asarray(v)

    flat = {k: restore(k, v) for k, v in flat.items()}
    params = _unflatten(flat)
    config = None
    cfg_file = path / "config.json"
    if cfg_file.exists():
        config = json.loads(cfg_file.read_text())
    return params, config


def _remap_fish_qwen3_omni_keys(weights: dict) -> dict:
    """ref llama.py:229-246."""
    if not any(k.startswith(("text_model.", "audio_decoder.")) for k in weights):
        return weights
    new = {}
    for k, v in weights.items():
        if k.startswith("text_model.model."):
            nk = k[len("text_model.model."):]
        elif k.startswith("audio_decoder."):
            suffix = k[len("audio_decoder."):]
            nk = suffix if suffix.startswith("codebook_embeddings.") else "fast_" + suffix
        else:
            nk = k
        new[nk] = v
    return new


def load_torch_lm_checkpoint(path: str | Path) -> dict:
    """Reference checkpoint dir -> flat {torch_name: np.ndarray} state dict.
    Feed the result to models.init.convert_dual_ar_state_dict."""
    path = Path(path)
    index_json = path / "model.safetensors.index.json"
    single_st = path / "model.safetensors"
    pth_file = path / "model.pth"

    if index_json.exists():
        from safetensors.numpy import load_file

        st_index = json.loads(index_json.read_text())
        weights = {}
        for shard in sorted(set(st_index["weight_map"].values())):
            weights.update(load_file(str(path / shard)))
        return _remap_fish_qwen3_omni_keys(weights)
    if single_st.exists():
        from safetensors.numpy import load_file

        return _remap_fish_qwen3_omni_keys(load_file(str(single_st)))
    if pth_file.exists():
        import torch

        weights = torch.load(pth_file, map_location="cpu", mmap=True,
                             weights_only=True)
        if "state_dict" in weights:
            weights = weights["state_dict"]
        if weights and next(iter(weights)).startswith("model."):
            weights = {k[len("model."):]: v for k, v in weights.items()}
        weights = {k: v.float().numpy() for k, v in weights.items()
                   if "audio_" not in k}
        return weights
    raise FileNotFoundError(f"No model weights found in {path}")


def load_torch_codec_checkpoint(path: str | Path) -> dict:
    """codec.pth -> flat numpy state dict ('generator.' prefix stripped,
    ref dac/inference.py:35-40). Feed to codec.convert.convert_dac_state_dict."""
    import torch

    state_dict = torch.load(str(path), map_location="cpu", weights_only=True)
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    if any("generator" in k for k in state_dict):
        state_dict = {k.replace("generator.", ""): v
                      for k, v in state_dict.items() if "generator." in k}
    return {k: v.float().numpy() for k, v in state_dict.items()}
