"""vtp_tpu — TPU-native rebuild of the MiniMax-AI/VTP image-tokenizer stack.

A ground-up JAX/XLA/Pallas implementation of the VTP model family
(reference: MiniMax-AI/VTP): a DINOv3-style ViT trunk with an f16d64
feature bottleneck, a transformer + pixel-shuffle pixel decoder, and a
CLIP-style text transformer, plus evaluation harnesses (reconstruction
rFID, zero-shot, linear probing) and the DiT latent-extraction pipeline.

Design notes (TPU-first, not a port):
  * Parameters are plain pytrees (nested dicts); forward passes are pure
    functions, jittable and shardable with jax.sharding / pjit.
  * Transformer blocks are stacked along a leading ``depth`` axis and run
    under ``lax.scan`` — one block compilation, fast tracing.
  * RoPE sin/cos tables are computed once per forward (the reference
    recomputes them per block — vision_transformer.py:228-233).
  * Attention runs on a Pallas flash-attention kernel on TPU with an
    einsum reference path for parity testing.
  * Mixed precision is an explicit policy (params fp32, matmul compute
    bf16 for the encoder, fp32 for the decoder) mirroring the
    reference's autocast semantics.
"""

from vtp_tpu.config import VTPConfig, vtp_small, vtp_base, vtp_large
from vtp_tpu.models.vtp_model import VTPModel
from vtp_tpu.tokenizers import SimpleTokenizer, get_tokenizer

__version__ = "0.1.0"

__all__ = [
    "VTPConfig",
    "VTPModel",
    "vtp_small",
    "vtp_base",
    "vtp_large",
    "SimpleTokenizer",
    "get_tokenizer",
]
