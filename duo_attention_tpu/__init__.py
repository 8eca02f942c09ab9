"""duo_attention_tpu — TPU-native DuoAttention long-context inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
mit-han-lab/duo-attention: retrieval/streaming attention-head splits, static
split KV caches, chunked prefill, quantized serving, gate training, and the
NIAH/LongBench/efficiency evaluation suite.

Quick-start surface (preserving the reference's 4-call contract,
README.md:119-153: load pattern → sparsify → enable → run):

    from duo_attention_tpu import (
        load_attn_pattern, sparsify_attention_heads, DuoConfig, DuoEngine
    )
    heads, sink, recent = load_attn_pattern(pattern_dir)
    heads, sparsity = sparsify_attention_heads(heads, sparsity=0.5)
    params, cfg, duo = convert.load_hf_model(model_dir, heads, sink, recent)
    engine = DuoEngine(params, cfg, duo)
    tokens, _ = engine.generate(input_ids, max_new_tokens=50)
"""

from .config import DuoConfig, ModelConfig, PRESETS, RopeScaling
from .patterns import (
    load_attn_pattern,
    num_full_kv_heads_per_layer,
    save_attn_pattern,
    sparsify_attention_heads,
)
from .cache import DuoCache, init_cache, kv_memory_bytes
from .engine import DuoEngine
from .models.convert import load_hf_model, reorder_params
from .serving import Request, ServingEngine

__version__ = "0.1.0"

__all__ = [
    "DuoConfig",
    "ModelConfig",
    "RopeScaling",
    "PRESETS",
    "load_attn_pattern",
    "save_attn_pattern",
    "sparsify_attention_heads",
    "num_full_kv_heads_per_layer",
    "DuoCache",
    "init_cache",
    "kv_memory_bytes",
    "DuoEngine",
    "load_hf_model",
    "reorder_params",
    "Request",
    "ServingEngine",
]
