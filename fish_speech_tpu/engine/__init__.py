from .generate import (
    GenerateLongRequest,
    GenerateResponse,
    TTSEngine,
    group_turns_into_batches,
    split_text_by_speaker,
)

__all__ = [
    "GenerateLongRequest", "GenerateResponse", "TTSEngine",
    "group_turns_into_batches", "split_text_by_speaker",
]
