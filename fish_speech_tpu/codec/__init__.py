from .config import CodecTransformerConfig, DACConfig, RVQConfig, s2_pro_codec_config, tiny_codec_config
from .convert import convert_dac_state_dict
from .init import init_dac_params
from .model import dac_decode_latents, dac_encode, dac_from_indices, decoder, encoder
from .rvq import rvq_decode, rvq_encode

__all__ = [
    "CodecTransformerConfig", "DACConfig", "RVQConfig",
    "s2_pro_codec_config", "tiny_codec_config",
    "convert_dac_state_dict", "init_dac_params",
    "dac_decode_latents", "dac_encode", "dac_from_indices",
    "decoder", "encoder", "rvq_decode", "rvq_encode",
]
