"""Dual-space cross-attention interaction blocks.

Reference: ``Attention`` / ``AttentionBlock``
(``/root/reference/model_spatial_query.py:862-936``).  Queries come
from the content (P) tokens, keys/values from the style (Z) tokens.
The sequence length is 16 tokens, so there is nothing to block or ring
here — the TPU-native form is plain batched einsums that XLA maps onto
the MXU; the interesting parity details are:

  * grouped projection: planes = out_dim // compress (=128),
    heads = groups (=4), head_dim = 32, softmax scale = planes**-0.5
    (NOT head_dim**-0.5 — model_spatial_query.py:873);
  * pre-norm is a LayerNorm over tokens AND channels jointly
    (layer_norm_tokens), applied only to the K/V stream;
  * the query stream is NOT normalized (model_spatial_query.py:924).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from transeditor_tpu.nn.layers import EqualLinear, layer_norm_tokens


class Attention(nn.Module):
    """Grouped cross-attention: Q <- p tokens, K/V <- z tokens."""

    out_dim: int
    lr_mul: float = 1.0
    groups: int = 4
    compress: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, kv_tokens: jax.Array, q_tokens: jax.Array,
                 return_similarity: bool = False):
        # kv_tokens: [B, L, C_in]; q_tokens: [B, M, C_param]
        planes = self.out_dim // self.compress
        gp = planes // self.groups
        scale = planes ** -0.5

        q = EqualLinear(planes, lr_mul=self.lr_mul, dtype=self.dtype,
                        name="q")(q_tokens)
        k = EqualLinear(planes, lr_mul=self.lr_mul, dtype=self.dtype,
                        name="k")(kv_tokens)
        v = EqualLinear(planes, lr_mul=self.lr_mul, dtype=self.dtype,
                        name="v")(kv_tokens)

        b, m, _ = q.shape
        l = k.shape[1]
        q = q.reshape(b, m, self.groups, gp)
        k = k.reshape(b, l, self.groups, gp)
        v = v.reshape(b, l, self.groups, gp)

        # sim[b,g,m,l] — softmax over the key axis.
        logits = jnp.einsum("bmgp,blgp->bgml", q, k) * scale
        sim = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        sim = sim.astype(q.dtype)
        out = jnp.einsum("bgml,blgp->bmgp", sim, v).reshape(b, m, planes)

        out = EqualLinear(self.out_dim, lr_mul=self.lr_mul,
                          dtype=self.dtype, name="proj")(out)
        if return_similarity:
            return out, sim
        return out


class AttentionBlock(nn.Module):
    """Pre-LN cross-attention + MLP residual block
    (model_spatial_query.py:904-936)."""

    in_dim: int
    out_dim: int
    lr_mul: float = 1.0
    groups: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, q_tokens: jax.Array,
                 return_similarity: bool = False):
        attn = Attention(self.out_dim, lr_mul=self.lr_mul,
                         groups=self.groups, dtype=self.dtype,
                         name="atten")
        out = attn(layer_norm_tokens(x), q_tokens,
                   return_similarity=return_similarity)
        sim: Optional[jax.Array] = None
        if return_similarity:
            out, sim = out

        if self.out_dim != self.in_dim:
            x = EqualLinear(self.out_dim, lr_mul=self.lr_mul,
                            dtype=self.dtype, name="proj")(x) + out
        else:
            x = x + out

        h = layer_norm_tokens(x)
        h = EqualLinear(self.out_dim, lr_mul=self.lr_mul, dtype=self.dtype,
                        name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = EqualLinear(self.out_dim, lr_mul=self.lr_mul, dtype=self.dtype,
                        name="mlp_1")(h)
        x = x + h

        if return_similarity:
            return x, sim
        return x
