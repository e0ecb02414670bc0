from layerskip_tpu.ops.attention import gqa_attention
from layerskip_tpu.ops.kv_cache import KVCache, QuantKV, init_kv_cache, write_kv
from layerskip_tpu.ops.linear import QuantTensor, apply_weight
from layerskip_tpu.ops.rmsnorm import rms_norm
from layerskip_tpu.ops.rope import apply_rope, rope_cos_sin, rope_inv_freq

__all__ = [
    "KVCache", "QuantKV", "QuantTensor", "apply_rope", "apply_weight",
    "gqa_attention", "init_kv_cache", "rms_norm", "rope_cos_sin",
    "rope_inv_freq", "write_kv",
]
