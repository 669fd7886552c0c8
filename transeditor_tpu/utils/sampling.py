"""Latent samplers, keyed on explicit JAX PRNG keys.

Reference: ``utils/sample.py`` (prepare_param :3-13, prepare_noise_new
:16-21) draws from the global torch RNG; here every draw takes a key.
Layout note: the reference returns [B, 512, 16]; our token tensors are
[B, 16, 512] (tokens-major).

Methods:
  * ``sample_z`` / ``sample_p``: i.i.d. N(0,1) tokens ("query" /
    "spatial" methods).
  * ``*_same=True``: one draw repeated across the batch (the
    "query_same" / "spatial_same" methods used for swap/interp grids).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(key: jax.Array, batch: int, n_tokens: int = 16,
                  dim: int = 512, truncation: float = 1.0,
                  same: bool = False, dtype=jnp.float32) -> jax.Array:
    """[B, T, D] standard-normal tokens (optionally batch-repeated)."""
    if same:
        one = jax.random.normal(key, (1, n_tokens, dim), dtype)
        out = jnp.broadcast_to(one, (batch, n_tokens, dim))
    else:
        out = jax.random.normal(key, (batch, n_tokens, dim), dtype)
    if truncation != 1.0:
        out = out * truncation
    return out


def sample_zp(key: jax.Array, batch: int, n_tokens: int = 16,
              dim: int = 512, truncation: float = 1.0,
              z_same: bool = False, p_same: bool = False,
              dtype=jnp.float32):
    """Draw a (Z, P) pair with independent subkeys."""
    kz, kp = jax.random.split(key)
    z = sample_tokens(kz, batch, n_tokens, dim, truncation, z_same, dtype)
    p = sample_tokens(kp, batch, n_tokens, dim, truncation, p_same, dtype)
    return z, p
