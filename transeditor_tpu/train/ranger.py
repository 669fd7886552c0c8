"""Ranger optimizer (RAdam + Lookahead + gradient centralization) in optax.

Reference: ``pSp/training/ranger.py:30-165`` — the pSp coach's default
optimizer (``psp_training_options.py`` optim_name 'ranger').

Composition (documented equivalence, not a port):
  * gradient centralization: subtract the per-filter mean from the
    gradient of every rank>1 parameter (GC for both conv and fc, the
    reference default use_gc=True, gc_conv_only=False).  Our kernels
    put the output dimension LAST, so the mean runs over all axes
    except the last (torch centralizes over all but dim 0 with output
    first — same statistic).
  * RAdam (rectified Adam) — optax.scale_by_radam.
  * Lookahead: k=6 steps, slow-weight alpha=0.5 — optax.lookahead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def centralize_gradients() -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g
        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate: float = 1e-3, betas=(0.95, 0.999),
           eps: float = 1e-5, k: int = 6, alpha: float = 0.5,
           use_gc: bool = True) -> optax.GradientTransformation:
    """Returns a lookahead-wrapped optimizer.

    NOTE: parameters must be wrapped in ``optax.LookaheadParams``; use
    ``ranger_simple`` for a plain (non-lookahead) RAdam+GC variant with
    the same inner dynamics.
    """
    inner = ranger_simple(learning_rate, betas, eps, use_gc)
    return optax.lookahead(inner, sync_period=k, slow_step_size=alpha)


def ranger_simple(learning_rate: float = 1e-3, betas=(0.95, 0.999),
                  eps: float = 1e-5,
                  use_gc: bool = True) -> optax.GradientTransformation:
    parts = []
    if use_gc:
        parts.append(centralize_gradients())
    parts.append(optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale(-learning_rate))
    return optax.chain(*parts)
