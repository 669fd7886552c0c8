"""Single source of truth for model / training hyper-parameters.

The reference scatters these across ten argparse front-ends (e.g.
``train_spatial_query.py:377-432``, ``test_spatial_query.py:240-264``)
and recomputes derived invariants (``latent=512``,
``token = 2*(log2(size)-1)``) at every call site.  Here they are one
dataclass with the invariants computed once.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Generator / Discriminator architecture configuration.

    Mirrors the knobs of the reference ``Generator.__init__``
    (``model_spatial_query.py:428-464``) with training-script defaults
    (``train_spatial_query.py:395-415``).
    """

    size: int = 256                     # output resolution
    style_dim: int = 512                # Z token feature dim (--latent)
    param_dim: int = 512                # P token feature dim
    n_tokens: int = 16                  # tokens per space (--para_num)
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01                # mapping-net lr multiplier
    layer_noise_injection: bool = False  # --inject_noise
    use_spatial_mapping: bool = True     # not --no_spatial_map
    num_region: int = 1
    n_trans: int = 8                     # --num_trans (train default 8)
    # 'feature' == reference --pixel_norm_op_dim 1 (normalize over the
    # 512-dim feature axis of [B,512,16]); 'token' == dim 2.
    pixel_norm_axis: str = "feature"
    no_trans: bool = False
    attn_groups: int = 4
    attn_compress: int = 4
    # test-only knob: cap synthesis channel counts so unit tests run on
    # CPU quickly.  512 == reference behaviour; never change for parity.
    max_channels: int = 512
    # compute dtype for the synthesis/discriminator path; params are
    # always float32.  bfloat16 keeps the MXU at full rate.
    dtype: str = "float32"
    # opt-in int8 MXU path for the synthesis 3x3 modulated convs
    # (ops/quant.py) — inference-only speed mode; None == full
    # precision.  ToRGB / mapping / attention stay in compute dtype.
    quantize: str | None = None

    # ---- derived invariants (reference train_spatial_query.py:430-432)

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def token_dim(self) -> int:
        """Number of per-layer style vectors (14 @ 256px, 18 @ 1024px)."""
        return 2 * (self.log_size - 1)

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        """Number of styled conv layers (13 @ 256px)."""
        return (self.log_size - 2) * 2 + 1

    @property
    def num_mappings(self) -> int:
        """Independent per-token mapping layers (16 / num_region)."""
        return self.n_tokens // self.num_region

    @property
    def channels(self) -> dict[int, int]:
        cm = self.channel_multiplier
        raw = {
            4: 512, 8: 512, 16: 512, 32: 512,
            64: 256 * cm, 128: 128 * cm, 256: 64 * cm,
            512: 32 * cm, 1024: 16 * cm,
        }
        return {k: min(v, self.max_channels) for k, v in raw.items()}

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def __post_init__(self):
        if self.size & (self.size - 1):
            raise ValueError(f"size must be a power of two, got {self.size}")
        if self.pixel_norm_axis not in ("feature", "token"):
            raise ValueError("pixel_norm_axis must be 'feature' or 'token'")
        if self.n_tokens % self.num_region:
            raise ValueError("n_tokens must be divisible by num_region")
        if self.quantize not in (None, "int8"):
            raise ValueError("quantize must be None or 'int8'")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """GAN training recipe (reference train_spatial_query.py:381-391)."""

    total_steps: int = 800_000
    batch_size: int = 16                 # global batch
    lr: float = 0.002
    r1_gamma: float = 10.0               # --r1
    d_reg_every: int = 16
    g_reg_every: int = 4
    path_regularize: float = 2.0
    path_batch_shrink: int = 2
    grad_accum: int = 1                  # microbatches per step (HBM knob)
    spatial_regu: bool = False
    spatial_path_regularize: float = 2.0
    regu_space: str = "p+"               # --regu_sapce [sic]
    ema_halflife_kimg: float = 10.0      # accum = 0.5 ** (32 / (10*1000))
    sample_every: int = 500
    checkpoint_every: int = 10_000
    n_sample: int = 64
    seed: int = 0

    @property
    def ema_decay(self) -> float:
        return 0.5 ** (32.0 / (self.ema_halflife_kimg * 1000.0))
