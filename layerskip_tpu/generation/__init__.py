from layerskip_tpu.generation.engine import (
    Engine,
    GenerateOutput,
    ar_generate,
    postprocess_output,
    spec_generate,
)
from layerskip_tpu.generation.generator import (
    GenerationResult,
    GenerationStrategyResult,
    LlamaGenerator,
)
from layerskip_tpu.generation.sampling import (
    SamplingConfig,
    sample_token,
    token_distribution,
    top_k_top_p_filter,
)

__all__ = [
    "Engine",
    "GenerateOutput",
    "GenerationResult",
    "GenerationStrategyResult",
    "LlamaGenerator",
    "SamplingConfig",
    "ar_generate",
    "postprocess_output",
    "sample_token",
    "spec_generate",
    "token_distribution",
    "top_k_top_p_filter",
]
