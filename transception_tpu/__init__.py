"""transception_tpu — a TPU-native (JAX/Flax/Pallas/pjit) medical image
segmentation framework with the capabilities of xmindflow/TransCeption.

This is a from-scratch TPU-first design, not a port: NHWC layouts, bf16
compute with fp32 accumulation, batched einsum attention (no per-head Python
loops), jit-compiled training/eval steps, GSPMD sharding over a
`jax.sharding.Mesh`, and Pallas kernels for the hot linear-attention ops.

Reference behavior map: /root/reference (cited per-module as file:line).
"""

__version__ = "0.1.0"

from transception_tpu.core.config import (  # noqa: F401
    TransceptionConfig,
    TrainConfig,
    DataConfig,
)
from transception_tpu.models.transception import MSTransception  # noqa: F401
from transception_tpu.models.registry import create_model, MODEL_REGISTRY  # noqa: F401
