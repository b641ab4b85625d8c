from .config import DualARConfig, s2_pro_lm_config, tiny_dual_ar_config
from .decode import SamplingConfig, decode_one_token, generate
from .dual_ar import KVCache, forward_generate, forward_generate_fast, forward_train
from .init import convert_dual_ar_state_dict, init_dual_ar_params

__all__ = [
    "DualARConfig", "s2_pro_lm_config", "tiny_dual_ar_config",
    "SamplingConfig", "decode_one_token", "generate",
    "KVCache", "forward_generate", "forward_generate_fast", "forward_train",
    "convert_dual_ar_state_dict", "init_dual_ar_params",
]
