from .spectrogram import log_mel_spectrogram, mel_similarity
from .checkpoint import (
    load_params,
    load_torch_lm_checkpoint,
    save_params,
)
from .file import get_latest_checkpoint, list_files

__all__ = [
    "log_mel_spectrogram", "mel_similarity",
    "load_params", "load_torch_lm_checkpoint", "save_params",
    "get_latest_checkpoint", "list_files",
]
