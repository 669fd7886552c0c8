"""Conv/matmul precision policy.

float32 paths (parity tests, checkpoint-fidelity decoding) use
HIGHEST so results match the reference bit-for-bit-ish; bfloat16 paths
(training/serving) use DEFAULT so the MXU runs native bf16 passes
instead of multi-pass fp32 emulation (~3-6x faster).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv_precision(dtype) -> lax.Precision:
    if jnp.dtype(dtype) == jnp.float32:
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT
