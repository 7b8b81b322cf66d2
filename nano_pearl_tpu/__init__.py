"""nano-PEARL-TPU: a TPU-native parallel speculative decoding engine.

A from-scratch JAX/XLA/Pallas implementation of the PEARL algorithm
(parallel speculative decoding with adaptive draft length, ICLR 2025,
arXiv:2408.11850) with the capabilities of the smart-lty/nano-PEARL
reference engine, re-designed for TPU:

- Single-controller JAX instead of one-process-per-GPU + shm RPC + NCCL
  (reference: nano_pearl/pearl_engine/pearl_engine.py, pearl_model_runner.py).
- GSPMD tensor parallelism over a device mesh instead of torch TP layers
  (reference: nano_pearl/layers/linear.py, embed_head.py), including
  non-power-of-2 TP via parameter padding (reference: pearl_config.py:37-67).
- The draft and target models live on disjoint sub-meshes and run
  concurrently via async dispatch; verification happens on-device.
- Fully-compiled decode steps (jit + lax.scan) instead of CUDA graphs.
- A unified paged attention with per-token context lengths serving
  prefill, autoregressive decode, and PEARL's packed multi-token verify
  forward (reference: pearl_model_runner.py:560-588).

Public API mirrors the reference package surface
(reference: nano_pearl/__init__.py):

    from nano_pearl_tpu import PearlConfig, PearlEngine, SamplingParams, logger
"""

from nano_pearl_tpu.config import PearlConfig, ModelConfig, SamplingParams
from nano_pearl_tpu.utils.logging import logger

__all__ = [
    "PearlConfig",
    "ModelConfig",
    "SamplingParams",
    "PearlEngine",
    "DataParallelEngine",
    "logger",
]


def __getattr__(name):
    # Lazy import: the engine pulls in jax and compiles helpers; keep
    # `import nano_pearl_tpu` light for config-only users.
    if name == "PearlEngine":
        from nano_pearl_tpu.engine.engine import PearlEngine

        return PearlEngine
    if name == "DataParallelEngine":
        from nano_pearl_tpu.engine.dp import DataParallelEngine

        return DataParallelEngine
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
