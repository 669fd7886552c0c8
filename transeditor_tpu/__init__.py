"""TransEditor-TPU: a TPU-native dual-space GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BillyXYB/TransEditor (CVPR 2022): a dual-space (content P / style Z)
transformer-interaction GAN for controllable facial editing, plus its
training, inversion, editing, and evaluation stacks.

Design notes (TPU-first, not a port):
  * Compute path is pure JAX: `lax.conv_general_dilated` with input
    dilation implements the fused up-FIR-down resampler in one XLA op;
    modulated convolutions use the scale-input/scale-output identity so
    the MXU sees plain batched convs instead of per-sample weights.
  * Token tensors are laid out [batch, tokens, features] and images are
    NHWC (channel-minor = TPU lane dimension).
  * Parallelism is expressed with `jax.sharding.Mesh` + NamedSharding;
    gradients reduce over ICI via XLA collectives, not an explicit
    process-group API.
"""

__version__ = "0.1.0"

from transeditor_tpu.config import ModelConfig, TrainConfig
