from .text_data_pb2 import SampledData, Semantics, Sentence, TextData

__all__ = ["SampledData", "Semantics", "Sentence", "TextData"]
