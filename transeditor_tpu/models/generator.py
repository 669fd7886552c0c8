"""TransEditor generator: dual-space transformer GAN (Flax Linen).

Reference: ``Generator`` (``/root/reference/model_spatial_query.py:428-728``).

Instead of the reference's single 14-flag ``forward`` (:591-609), the
model exposes composable stages — ``map_codes``, ``interact``,
``style_latents``, ``synthesize`` — plus a ``__call__`` that mirrors the
reference mode seams used by the projector / encoder / editor / metrics:

  reference flag                      | here
  ------------------------------------+--------------------------------
  return_mapped_codes / only_mapped_* | g.apply(..., method='map_codes')
  return_only_style_latent            | g.apply(..., method='style_latents_from')
  use_*_mapping=False (plus-space in) | __call__(map_z=False, map_p=False)
  input_is_latent (w-space direct)    | __call__(input_is_latent=True)
  return_latents / return_style       | always returned in GeneratorOutput

Dataflow (size=256): Z,P in [B, 16, 512] (tokens-major; the reference
uses [B, 512, 16]); per-token mapping -> Z+,P+; 8 cross-attn blocks
(block 0 concatenates a 16x16 one-hot positional identity to both
streams, :537-539,672-673); adjust_style EqualLinear 16->14 mixes
tokens into 14 per-layer styles; P+ reshapes to the 4x4 synthesis input
(:699 — TransEditor's architectural signature, replacing StyleGAN2's
constant input); 13 styled convs + 7 ToRGB skips -> NHWC image.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.nn.attention import AttentionBlock
from transeditor_tpu.nn.layers import EqualLinear, StyledConv, ToRGB, TokenMapping


@dataclasses.dataclass
class GeneratorOutput:
    image: jax.Array                       # [B, H, W, 3]
    latent: Optional[jax.Array] = None     # [B, 14, 512] per-layer styles
    p_plus: Optional[jax.Array] = None     # [B, 16, 512]
    z_plus: Optional[jax.Array] = None     # [B, 16, 512]
    similarity: Optional[list] = None      # per-block [B, g, 16, 16]


class Generator(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.compute_dtype

        if cfg.use_spatial_mapping:
            self.spatial_mapping = TokenMapping(
                cfg.n_tokens, cfg.param_dim, lr_mul=cfg.lr_mlp,
                pixel_norm_axis=cfg.pixel_norm_axis, dtype=dtype,
                n_mapping=cfg.num_mappings)
        self.style_mapping = TokenMapping(
            cfg.n_tokens, cfg.style_dim, lr_mul=cfg.lr_mlp,
            pixel_norm_axis=cfg.pixel_norm_axis, dtype=dtype,
            n_mapping=cfg.num_mappings)

        if not cfg.no_trans:
            blocks = []
            for i in range(cfg.n_trans):
                in_dim = cfg.style_dim + cfg.n_tokens if i == 0 else cfg.style_dim
                blocks.append(AttentionBlock(
                    in_dim=in_dim, out_dim=cfg.style_dim, lr_mul=cfg.lr_mlp,
                    groups=cfg.attn_groups, dtype=dtype,
                    name=f"interact_{i}"))
            self.interact = blocks

        # 16 interacted tokens -> n_latent (14) per-layer styles.
        self.adjust_style = EqualLinear(cfg.token_dim, dtype=dtype)

        ch = cfg.channels
        self.conv1 = StyledConv(
            ch[4], 3, cfg.style_dim, blur_kernel=cfg.blur_kernel,
            noise_injection=cfg.layer_noise_injection, dtype=dtype,
            quantize=cfg.quantize)
        self.to_rgb1 = ToRGB(cfg.style_dim, upsample=False, dtype=dtype)

        convs, to_rgbs = [], []
        for i in range(3, cfg.log_size + 1):
            out_ch = ch[2 ** i]
            convs.append(StyledConv(
                out_ch, 3, cfg.style_dim, upsample=True,
                blur_kernel=cfg.blur_kernel,
                noise_injection=cfg.layer_noise_injection, dtype=dtype,
                quantize=cfg.quantize, name=f"conv_up_{i}"))
            convs.append(StyledConv(
                out_ch, 3, cfg.style_dim, blur_kernel=cfg.blur_kernel,
                noise_injection=cfg.layer_noise_injection, dtype=dtype,
                quantize=cfg.quantize, name=f"conv_{i}"))
            to_rgbs.append(ToRGB(cfg.style_dim, dtype=dtype,
                                 name=f"to_rgb_{i}"))
        self.convs = convs
        self.to_rgbs = to_rgbs

    # ------------------------------------------------------------------
    # stages

    def map_codes(self, z: jax.Array, p: jax.Array,
                  map_z: bool = True, map_p: bool = True):
        """[B,16,512] x2 -> (z_plus, p_plus) (reference :626-646)."""
        cfg = self.cfg
        p_plus = (self.spatial_mapping(p)
                  if (map_p and cfg.use_spatial_mapping) else p)
        z_plus = self.style_mapping(z) if map_z else z
        return z_plus, p_plus

    def map_z(self, z: jax.Array) -> jax.Array:
        return self.style_mapping(z)

    def map_p(self, p: jax.Array) -> jax.Array:
        if self.cfg.use_spatial_mapping:
            return self.spatial_mapping(p)
        return p

    def interact_codes(self, z_plus: jax.Array, p_plus: jax.Array,
                       return_similarity: bool = False):
        """Cross-attention interaction (reference :670-679).

        Block 0 consumes both streams concatenated with a one-hot
        positional identity; blocks 1..n-1 re-query with P+.
        """
        cfg = self.cfg
        b = z_plus.shape[0]
        eye = jnp.eye(cfg.n_tokens, dtype=z_plus.dtype)
        eye = jnp.broadcast_to(eye, (b, cfg.n_tokens, cfg.n_tokens))
        x = jnp.concatenate([z_plus, eye], axis=-1)
        q0 = jnp.concatenate([p_plus, eye], axis=-1)

        sims = []
        out = self.interact[0](x, q0, return_similarity=return_similarity)
        if return_similarity:
            out, sim = out
            sims.append(sim)
        for blk in self.interact[1:]:
            out = blk(out, p_plus, return_similarity=return_similarity)
            if return_similarity:
                out, sim = out
                sims.append(sim)
        if return_similarity:
            return out, sims
        return out

    def style_latents_from(self, tokens: jax.Array) -> jax.Array:
        """16 tokens -> [B, 14, 512] per-layer styles (reference :683-688).

        ``adjust_style`` mixes across the TOKEN axis per feature:
        latent[b,j,d] = sum_t tokens[b,t,d] * W[t,j] * scale + bias[j].
        """
        # [B,T,D] -> [B,D,T] @ [T,14] -> [B,D,14] -> [B,14,D]
        y = self.adjust_style(jnp.swapaxes(tokens, 1, 2))
        return jnp.swapaxes(y, 1, 2)

    def synthesize(self, p_plus: jax.Array, latent: jax.Array,
                   noise: Optional[Sequence[Optional[jax.Array]]] = None):
        """P+ -> 4x4 input map; 13 styled convs + RGB skips (:699-716)."""
        cfg = self.cfg
        b = p_plus.shape[0]
        # reference: [B,512,16] -> reshape (B,512,4,4); spatial site
        # (h,w) holds token t = 4*h + w.  In NHWC that is a transpose
        # then reshape: x[b,h,w,d] = p_plus[b, 4h+w, d].
        x = p_plus.reshape(b, 4, 4, cfg.param_dim).astype(cfg.compute_dtype)

        if noise is None:
            noise = [None] * cfg.num_layers

        x = self.conv1(x, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(x, latent[:, 1])

        i = 1
        for idx in range(len(self.to_rgbs)):
            x = self.convs[2 * idx](x, latent[:, i], noise=noise[2 * idx + 1])
            x = self.convs[2 * idx + 1](x, latent[:, i + 1],
                                        noise=noise[2 * idx + 2])
            skip = self.to_rgbs[idx](x, latent[:, i + 2], skip)
            i += 2
        return skip

    # ------------------------------------------------------------------

    def __call__(
        self,
        z: jax.Array,
        p: jax.Array,
        *,
        input_is_latent: bool = False,
        map_z: bool = True,
        map_p: bool = True,
        trans_interact: bool = True,
        noise: Optional[Sequence[Optional[jax.Array]]] = None,
        return_similarity: bool = False,
    ) -> GeneratorOutput:
        """Full forward.

        Args:
          z: style codes [B,16,512], or w-space styles [B,14,512] when
            ``input_is_latent`` (reference :618-621).
          p: content codes [B,16,512] (or P+ when ``map_p=False``).
        """
        cfg = self.cfg
        if input_is_latent:
            map_z, trans_interact = False, False
        if cfg.no_trans:
            trans_interact = False

        if input_is_latent:
            # P is still mapped in this mode (reference :618-619).
            p_plus = self.map_p(p) if map_p else p
            z_plus = None
            latent = z
            sims = None
        else:
            z_plus, p_plus = self.map_codes(z, p, map_z=map_z, map_p=map_p)
            if trans_interact:
                out = self.interact_codes(
                    z_plus, p_plus, return_similarity=return_similarity)
                tokens, sims = out if return_similarity else (out, None)
            else:
                # only valid for no_trans models (reference :683)
                tokens, sims = z_plus, None
            latent = self.style_latents_from(tokens)

        image = self.synthesize(p_plus, latent, noise=noise)
        return GeneratorOutput(image=image, latent=latent, p_plus=p_plus,
                               z_plus=z_plus, similarity=sims)
