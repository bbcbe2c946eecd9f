from sow_tpu.models.configs import LLAMA_CONFIGS, get_config
from sow_tpu.models.llama import (
    LLAMA_FINETUNE_TARGET_MODULES,
    LLAMA_TARGET_MODULES,
    LlamaConfig,
    causal_lm_loss,
    count_params,
    forward,
    init_params,
    params_from_hf_state_dict,
)

__all__ = [
    "LLAMA_CONFIGS",
    "LLAMA_FINETUNE_TARGET_MODULES",
    "LLAMA_TARGET_MODULES",
    "LlamaConfig",
    "causal_lm_loss",
    "count_params",
    "forward",
    "get_config",
    "init_params",
    "params_from_hf_state_dict",
]
