"""layerskip_tpu — TPU-native self-speculative decoding framework.

Capabilities of facebookresearch/LayerSkip (arXiv 2404.16710), redesigned
for JAX/XLA/Pallas: early-exit drafting + batched verification with a shared
KV cache, whole-generation XLA programs, TP/DP sharding, int8 quantization,
and the LayerSkip training recipe.
"""

__version__ = "0.1.0"

from layerskip_tpu.config import GenerationConfig, ModelConfig, tiny_config

__all__ = ["GenerationConfig", "ModelConfig", "tiny_config", "__version__"]
