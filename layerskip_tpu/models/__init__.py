from layerskip_tpu.models import llama
from layerskip_tpu.models.llama import LayerParams, LlamaParams
from layerskip_tpu.models.params import (
    init_params,
    load_params,
    params_from_flat_dict,
    save_params,
)

__all__ = [
    "LayerParams", "LlamaParams", "init_params", "llama", "load_params",
    "params_from_flat_dict", "save_params",
]
