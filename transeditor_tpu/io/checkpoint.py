"""Native checkpointing via Orbax.

Reference: torch-save of ``{'g','d','g_ema','g_optim','d_optim'}``
every 10k iterations with resume-from-filename
(train_spatial_query.py:361-371,475-492).  Here:

  * ``save_train_state`` / ``restore_train_state`` — async-capable
    Orbax checkpoints of the full GANTrainState (params, EMA, both
    optimizer states, step, path-length stats): exact resume.
  * ``load_reference_generator`` — read a reference ``.pt`` bundle and
    return ported ``g_ema`` (and optionally ``g``/``d``) param trees.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.io.torch_port import (
    discriminator_params_from_torch,
    generator_params_from_torch,
    load_torch_checkpoint,
)


def save_train_state(ckpt_dir: str, step: int, state: Any) -> None:
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def restore_train_state(ckpt_dir: str, state_template: Any,
                        step: Optional[int] = None):
    """Restore the latest (or a specific) step. Returns (state, step)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        steps = sorted(int(d) for d in os.listdir(ckpt_dir)
                       if d.isdigit())
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        step = steps[-1]
    path = os.path.join(ckpt_dir, f"{step:06d}")
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, state_template)
    return state, step


def load_reference_generator(pt_path: str, cfg: ModelConfig,
                             key: str = "g_ema"):
    """Port ``g_ema`` (or ``g``) from a reference checkpoint bundle."""
    ckpt = load_torch_checkpoint(pt_path)
    return generator_params_from_torch(ckpt[key], cfg)


def load_reference_discriminator(pt_path: str, cfg: ModelConfig):
    ckpt = load_torch_checkpoint(pt_path)
    return discriminator_params_from_torch(ckpt["d"], cfg)
