"""TPU-native model families.

``llama`` is the equivalent of the reference's co-resident llama.cpp engine
(AO-Llama submodule, SURVEY.md §2.3), re-designed for JAX/XLA: layer-scanned
decoder, static KV cache, bfloat16 MXU matmuls, mesh-shardable weights.
"""

from . import llama, checkpoint, tokenizer  # noqa: F401
from .llama import LlamaConfig, forward, generate, init_params  # noqa: F401
