"""omniquant_tpu — a TPU-native quantized-LLM framework (JAX/XLA/Pallas).

From-scratch re-design of OmniQuant's capabilities (block-wise PTQ with
Learnable Weight Clipping and Learnable Equivalent Transformation) for TPU:
functional quantizers, pure-pytree models, jitted per-block calibration,
Pallas packed-weight kernels, and mesh-sharded serving.
"""

__version__ = "0.1.0"
