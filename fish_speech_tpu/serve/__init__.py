from .schema import (
    ServeReferenceAudio,
    ServeTTSRequest,
    ServeVQGANDecodeRequest,
    ServeVQGANDecodeResponse,
    ServeVQGANEncodeRequest,
    ServeVQGANEncodeResponse,
)
from .wav import wav_chunk_header

__all__ = [
    "ServeReferenceAudio", "ServeTTSRequest",
    "ServeVQGANDecodeRequest", "ServeVQGANDecodeResponse",
    "ServeVQGANEncodeRequest", "ServeVQGANEncodeResponse",
    "wav_chunk_header",
]
