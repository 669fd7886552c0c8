"""GAN losses (reference train_spatial_query.py:70-105)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred: jax.Array, fake_pred: jax.Array) -> jax.Array:
    """Non-saturating logistic D loss (:70-74)."""
    return (jnp.mean(jax.nn.softplus(-real_pred))
            + jnp.mean(jax.nn.softplus(fake_pred)))


def g_nonsaturating_loss(fake_pred: jax.Array) -> jax.Array:
    """Non-saturating logistic G loss (:86-89)."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def r1_penalty(d_apply, d_params, real_img: jax.Array) -> jax.Array:
    """R1 gradient penalty: E[|∇_x D(x)|²] (:77-83).

    ``jax.grad`` through the discriminator; the caller differentiates
    the result again w.r.t. ``d_params`` (grad-of-grad).
    """
    grad_fn = jax.grad(
        lambda img: jnp.sum(d_apply(d_params, img).astype(jnp.float32)))
    g = grad_fn(real_img).astype(jnp.float32)
    return jnp.mean(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1))


def path_length_penalty(synth_fn, latent: jax.Array, noise_img: jax.Array,
                        mean_path_length: jax.Array, decay: float = 0.01):
    """Perceptual path-length regularizer (:92-105).

    latent: [B, n_latent, D] per-layer styles; synth_fn(latent) -> img.
    Returns (penalty, new_mean_detached, path_lengths).
    """
    def proj(lat):
        img = synth_fn(lat).astype(jnp.float32)
        return jnp.sum(img * noise_img)

    grad = jax.grad(proj)(latent).astype(jnp.float32)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad ** 2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths)
                                            - mean_path_length)
    penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths


def path_noise(key: jax.Array, img_shape) -> jax.Array:
    """randn_like(img)/sqrt(H*W) (:93-95)."""
    b, h, w, c = img_shape
    return jax.random.normal(key, (b, h, w, c)) / jnp.sqrt(
        jnp.asarray(h * w, jnp.float32))
