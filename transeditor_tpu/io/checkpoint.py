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


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _async_ckptr


def save_train_state(ckpt_dir: str, step: int, state: Any,
                     async_save: bool = False) -> None:
    """Checkpoint the full train state.

    ``async_save=True`` serialises in a background thread so the train
    loop keeps stepping (at most one save in flight — a new save first
    waits out the previous one); call ``wait_for_saves()`` before
    process exit or restore.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()
        # force: re-saving a step overwrites, matching torch.save
        # semantics (a resumed run may legitimately re-hit a cadence
        # step; orbax otherwise refuses and kills the run)
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save completes."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


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
