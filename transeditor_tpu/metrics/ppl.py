"""Perceptual Path Length (reference metrics/evaluate_query.py:135-249).

Protocol: 10k samples in batches of 64; pairs of endpoints lerped at
t=0 (end-sampling) and t=eps (1e-4); decode; optional center crop
(rows 3c:7c, cols 2c:6c with c=H/8 — :225-227); VGG net-lin LPIPS
between the two decodes / eps²; filter to the [1st, 99th] percentile
and average.  Spaces: 'all' (lerp Z and P), 'z' (P batch-fixed), 'p'
(Z batch-fixed); ``eval_plus`` lerps in Z+/P+ and decodes with the
mappings bypassed (the reference's headline setting, :361-364).

TPU-native: one jitted program per batch computes sample -> (optional
map) -> lerp both endpoints -> decode 2B images -> LPIPS, returning B
distances; only the scalar batch lands on host.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.sampling import sample_tokens
from transeditor_tpu.zoo.lpips import LPIPS


def center_crop(img):
    c = img.shape[1] // 8
    return img[:, c * 3: c * 7, c * 2: c * 6, :]


def slerp(a, b, t, axis=1):
    """Spherical interpolation (evaluate_query.py:31-40).

    The reference normalizes over ITS trailing axis, which in its
    [B, 512, 16] layout is the 16-token axis — so in our [B, T, D]
    layout the axis is 1.  Replicated exactly (use_slerp PPL variant,
    evaluate_query.py:356-359)."""
    def normalize(x):
        return x * jax.lax.rsqrt(
            jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    a = normalize(a)
    b = normalize(b)
    d = jnp.sum(a * b, axis=axis, keepdims=True)
    p = t * jnp.arccos(d)
    c = normalize(b - d * a)
    return normalize(a * jnp.cos(p) + c * jnp.sin(p))


def make_ppl_distance_fn(cfg: ModelConfig, space: str = "all",
                         eval_plus: bool = True, crop: bool = False,
                         eps: float = 1e-4, use_slerp: bool = False):
    """Pure distance assembly: (gen_params, lpips_params, z, p, t) ->
    [B] path-length distances for 2B pre-sampled latent endpoints in
    our [2B, T, D] layout.  This is the deterministic core of the
    reference protocol (evaluate_query.py:172-242) — endpoint pairing
    ``x[::2], x[1::2]``, lerp/slerp at (t, t+eps), interleaved restack,
    mapping bypass under eval_plus, center crop, >256px bilinear
    downscale, LPIPS / eps² — exposed separately so the torch-CPU
    oracle can pin it on identical inputs."""
    gen = Generator(cfg)
    lpips = LPIPS(net="vgg")

    def distances(gp, lpp, z, p, t) -> jax.Array:
        if eval_plus:
            z, p = gen.apply(gp, z, p, method="map_codes")

        def interp_pairs(x):
            a, b = x[0::2], x[1::2]
            if use_slerp:
                e0 = slerp(a, b, t)
                e1 = slerp(a, b, t + eps)
            else:
                e0 = a + (b - a) * t
                e1 = a + (b - a) * (t + eps)
            return jnp.stack([e0, e1], 1).reshape(x.shape)

        lz = interp_pairs(z) if space in ("all", "z") else z
        lp = interp_pairs(p) if space in ("all", "p") else p

        out = gen.apply(gp, lz, lp,
                        map_z=not eval_plus, map_p=not eval_plus)
        img = out.image.astype(jnp.float32)
        if crop:
            img = center_crop(img)
        if img.shape[1] > 256:
            # F.interpolate(bilinear, align_corners=False) does NOT
            # antialias — match it (jax antialiases by default on
            # downscale)
            img = jax.image.resize(
                img, (img.shape[0], 256, 256, 3), "bilinear",
                antialias=False)
        d = lpips.apply(lpp, img[0::2], img[1::2])
        return d / (eps * eps)

    return distances


def percentile_filter_mean(distances: np.ndarray) -> float:
    """[1st, 99th]-percentile filtered mean (evaluate_query.py:244-249,
    with numpy's 'lower'/'higher' interpolation modes)."""
    lo = np.percentile(distances, 1, method="lower")
    hi = np.percentile(distances, 99, method="higher")
    kept = distances[(distances >= lo) & (distances <= hi)]
    return float(kept.mean())


def make_ppl_batch_fn(cfg: ModelConfig, gen_params, lpips_params,
                      space: str = "all", eval_plus: bool = True,
                      crop: bool = False, eps: float = 1e-4,
                      batch: int = 64, use_slerp: bool = False,
                      sampling: str = "end"):
    distances = make_ppl_distance_fn(cfg, space, eval_plus, crop,
                                     eps=eps, use_slerp=use_slerp)
    # weight trees ride through jit as ARGUMENTS, not closure constants
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    lpips_params = jax.tree.map(jnp.asarray, lpips_params)

    @jax.jit
    def ppl_batch(gp, lpp, key: jax.Array) -> jax.Array:
        kz, kp, kt = jax.random.split(key, 3)
        z = sample_tokens(kz, batch * 2, cfg.n_tokens, cfg.style_dim,
                          same=(space == "p"))
        p = sample_tokens(kp, batch * 2, cfg.n_tokens, cfg.param_dim,
                          same=(space == "z"))
        # end-sampling (t=0) by default; 'full' draws t~U[0,1)
        # (evaluate_query.py:167-171)
        t = (jax.random.uniform(kt, ()) if sampling == "full"
             else jnp.zeros(()))
        return distances(gp, lpp, z, p, t)

    return lambda key: ppl_batch(gen_params, lpips_params, key)


def compute_ppl(cfg: ModelConfig, gen_params, lpips_params,
                space: str = "all", eval_plus: bool = True,
                crop: bool = False, n_samples: int = 10_000,
                batch: int = 64, seed: int = 0,
                use_slerp: bool = False, sampling: str = "end",
                progress: Optional[Callable[[int], None]] = None) -> float:
    fn = make_ppl_batch_fn(cfg, gen_params, lpips_params, space,
                           eval_plus, crop, batch=batch,
                           use_slerp=use_slerp, sampling=sampling)
    key = jax.random.PRNGKey(seed)
    dists = []
    done = 0
    i = 0
    while done < n_samples:
        dists.append(np.asarray(fn(jax.random.fold_in(key, i))))
        done += batch
        i += 1
        if progress:
            progress(done)
    distances = np.concatenate(dists)[:n_samples]
    return percentile_filter_mean(distances)
