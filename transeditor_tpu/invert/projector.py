"""Optimization-based inversion (the projector).

Reference: ``projector_optimization.py`` — per image, initialise
(Z+, P+) at the mean of 10k mapped samples (:152-178), then 10k Adam
steps (:196-246) minimising

    LPIPS(vgg net-lin)(G(z+, p+), target)  [summed over batch]
    + 1e5 * noise_regularize   (only with --use_noise)
    + mse_weight * MSE         (default 0)

with a cosine-ramped LR (:52-57), annealed stochastic latent noise
(:60-63,200-202), per-step noise-map re-normalisation (:44-49,230),
and plus-space decoding (mappings bypassed, :203-205).

TPU-native design: the whole optimisation is ONE ``lax.scan`` jitted
program — 10k steps never return to the host (the reference pays a
Python round-trip per step).  Multiple images batch through the same
program; loss traces are scan outputs.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.sampling import sample_zp
from transeditor_tpu.zoo.lpips import LPIPS


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    steps: int = 10_000
    lr: float = 0.1
    lr_rampup: float = 0.05
    lr_rampdown: float = 0.25
    noise: float = 0.05          # latent-noise strength factor
    noise_ramp: float = 0.75
    noise_regularize: float = 1e5
    mse_weight: float = 0.0
    optimize_noise: bool = False  # --use_noise
    truncation: float = 1.0
    trace_every: int = 10


def lr_schedule(step, total, initial_lr, rampdown=0.25, rampup=0.05):
    """Cosine rampdown with linear warmup (reference get_lr :52-57)."""
    t = step / total
    ramp = jnp.minimum(1.0, (1.0 - t) / rampdown)
    ramp = 0.5 - 0.5 * jnp.cos(ramp * jnp.pi)
    ramp = ramp * jnp.minimum(1.0, t / rampup)
    return initial_lr * ramp


def noise_regularize(noises):
    """Multi-scale roll-correlation penalty (reference :21-41)."""
    loss = jnp.zeros((), jnp.float32)
    for noise in noises:
        n = noise.astype(jnp.float32)
        size = n.shape[1]
        while True:
            loss = (loss
                    + jnp.mean(n * jnp.roll(n, 1, axis=2)) ** 2
                    + jnp.mean(n * jnp.roll(n, 1, axis=1)) ** 2)
            if size <= 8:
                break
            b = n.shape[0]
            n = n.reshape(b, size // 2, 2, size // 2, 2, 1).mean(axis=(2, 4))
            size //= 2
    return loss


def noise_normalize(noises):
    """(noise - mean) / std, per map (reference :44-49).

    torch ``Tensor.std()`` is the UNBIASED estimator — ddof=1 matters
    on the small maps (sqrt(16/15) ≈ 3% on the 4x4 one).
    """
    out = []
    for n in noises:
        mean = jnp.mean(n)
        std = jnp.std(n, ddof=1)
        out.append((n - mean) / (std + 1e-12))
    return out


def make_noise_shapes(cfg: ModelConfig, batch: int):
    shapes = [(batch, 4, 4, 1)]
    for i in range(3, cfg.log_size + 1):
        for _ in range(2):
            shapes.append((batch, 2 ** i, 2 ** i, 1))
    return shapes


def estimate_latent_stats(cfg: ModelConfig, gen_params, key: jax.Array,
                          n_samples: int = 10_000, chunk: int = 1000,
                          truncation: float = 1.0):
    """Mean/std of the plus spaces from mapped random draws (:152-165).

    Returns (z_mean [T,D], z_std [D], p_mean [T,D]).
    """
    gen = Generator(cfg)
    # weight trees ride through jit as ARGUMENTS, not closure constants
    gen_params = jax.tree.map(jnp.asarray, gen_params)

    @jax.jit
    def chunk_stats(gp, k):
        z, p = sample_zp(k, chunk, cfg.n_tokens, cfg.style_dim, truncation)
        zp, pp = gen.apply(gp, z, p, method="map_codes")
        return (jnp.sum(zp, 0), jnp.sum(pp, 0),
                jnp.sum(zp.astype(jnp.float32) ** 2, 0))

    zs = ps = sq = 0.0
    n_chunks = n_samples // chunk
    for i in range(n_chunks):
        a, b, c = chunk_stats(gen_params, jax.random.fold_in(key, i))
        zs, ps, sq = zs + a, ps + b, sq + c
    n = n_chunks * chunk
    z_mean = zs / n
    p_mean = ps / n
    # reference latent_std: sqrt(sum over samples AND tokens of squared
    # deviation / n) -> [D] (:162)
    var_sum = jnp.sum(sq / n - z_mean.astype(jnp.float32) ** 2, axis=0)
    z_std = jnp.sqrt(jnp.maximum(var_sum, 0.0))
    return z_mean, z_std, p_mean


@functools.lru_cache(maxsize=8)
def _projector_programs(cfg: ModelConfig, pcfg: ProjectorConfig):
    """Jitted (run_chunk, final_decode, opt) for a (cfg, pcfg) pair.

    Cached at module level so REPEATED ``project()`` calls (batch after
    batch of real images) reuse the compiled chunk executable — the
    persistent compile cache is unusable on the axon backend, and a
    fresh jit per call costs ~40-50 s of recompilation per image batch
    (measured; the marginal step itself is ~7 ms at batch 4).  The
    varying pieces (z_std, the fold-in key) enter as jit ARGUMENTS.
    """
    gen = Generator(cfg)
    lpips = LPIPS(net="vgg")
    schedule = lambda step: lr_schedule(step, pcfg.steps, pcfg.lr,
                                        pcfg.lr_rampdown, pcfg.lr_rampup)
    opt = optax.adam(schedule)

    def decode(gp, z, p, noises):
        out = gen.apply(gp, z, p, map_z=False, map_p=False,
                        noise=noises)
        img = out.image.astype(jnp.float32)
        if img.shape[1] > 256:
            f = img.shape[1] // 256
            b, h, w, c = img.shape
            img = img.reshape(b, h // f, f, w // f, f, c).mean(axis=(2, 4))
        return img

    def loss_fn(gp, lpp, tgt, opt_vars, step, kstep, z_std):
        z = opt_vars["z"]
        if not pcfg.optimize_noise:
            noises = None
        else:
            noises = opt_vars["noises"]
            t = step / pcfg.steps
            strength = (z_std * pcfg.noise
                        * jnp.maximum(0.0, 1.0 - t / pcfg.noise_ramp) ** 2)
            z = z + jax.random.normal(kstep, z.shape) * strength[None, None]
        img = decode(gp, z, opt_vars["p"], noises)
        p_loss = jnp.sum(lpips.apply(lpp, img, tgt))
        mse = jnp.mean((img - tgt) ** 2)
        n_loss = (noise_regularize(noises) if pcfg.optimize_noise
                  else jnp.zeros(()))
        total = p_loss + pcfg.mse_weight * mse
        if pcfg.optimize_noise:
            total = total + pcfg.noise_regularize * n_loss
        return total, (p_loss, n_loss, mse)

    @jax.jit
    def run_chunk(gp, lpp, tgt, opt_vars, opt_state, steps_slice,
                  k_opt, z_std):
        def step_fn(carry, step):
            opt_vars, opt_state = carry
            kstep = jax.random.fold_in(k_opt, step)
            (_, (p_loss, n_loss, mse)), grads = jax.value_and_grad(
                loss_fn, argnums=3, has_aux=True)(
                    gp, lpp, tgt, opt_vars, step, kstep, z_std)
            updates, opt_state = opt.update(grads, opt_state, opt_vars)
            opt_vars = optax.apply_updates(opt_vars, updates)
            if pcfg.optimize_noise:
                opt_vars = dict(opt_vars,
                                noises=noise_normalize(opt_vars["noises"]))
            return (opt_vars, opt_state), (p_loss, n_loss, mse)

        (opt_vars, opt_state), traces = jax.lax.scan(
            step_fn, (opt_vars, opt_state), steps_slice)
        return opt_vars, opt_state, traces

    @jax.jit
    def final_decode(gp, opt_vars):
        noises = opt_vars.get("noises") if pcfg.optimize_noise else None
        return decode(gp, opt_vars["z"], opt_vars["p"], noises)

    return run_chunk, final_decode, opt


def project(cfg: ModelConfig, gen_params, lpips_params,
            target_images: jax.Array, pcfg: ProjectorConfig = ProjectorConfig(),
            key: Optional[jax.Array] = None, stats=None):
    """Invert a batch of target images ([B,H,W,3] in [-1,1]).

    Returns dict with z_plus, p_plus, (noises), images, and loss traces.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    k_stats, k_noise, k_opt = jax.random.split(key, 3)
    if stats is None:
        stats = estimate_latent_stats(cfg, gen_params, k_stats,
                                      truncation=pcfg.truncation)
    z_mean, z_std, p_mean = stats

    # weight trees ride through jit as ARGUMENTS, not closure constants
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    lpips_params = jax.tree.map(jnp.asarray, lpips_params)
    target_images = jnp.asarray(target_images)
    batch = target_images.shape[0]

    z0 = jnp.broadcast_to(z_mean[None], (batch, *z_mean.shape))
    p0 = jnp.broadcast_to(p_mean[None], (batch, *p_mean.shape))
    noise_shapes = make_noise_shapes(cfg, batch)
    noises0 = [jax.random.normal(jax.random.fold_in(k_noise, i), s)
               for i, s in enumerate(noise_shapes)]

    if pcfg.optimize_noise:
        opt_vars0 = {"z": z0, "p": p0, "noises": noises0}
    else:
        opt_vars0 = {"z": z0, "p": p0}

    # NOTE: ONE scan over all 10k steps de-optimizes badly on TPU
    # (measured 295 ms/step vs 22 ms/step in <=50-step chunks — a
    # length-dependent XLA/Mosaic pathology), so the optimisation runs
    # as a host loop of jitted fixed-size scan chunks; optax's count
    # state keeps the LR schedule globally consistent across chunks.
    chunk = min(50, pcfg.steps)
    run_chunk, final_decode, opt = _projector_programs(cfg, pcfg)
    z_std = jnp.asarray(z_std)

    opt_vars = opt_vars0
    opt_state = opt.init(opt_vars0)
    traces_chunks = []
    for start in range(0, pcfg.steps, chunk):
        n = min(chunk, pcfg.steps - start)   # tail chunk compiles once
        opt_vars, opt_state, tr = run_chunk(
            gen_params, lpips_params, target_images,
            opt_vars, opt_state, jnp.arange(start, start + n),
            k_opt, z_std)
        traces_chunks.append(tr)
    traces = tuple(jnp.concatenate([t[i] for t in traces_chunks])
                   for i in range(3))
    final_img = final_decode(gen_params, opt_vars)
    result = {
        "z_plus": np.asarray(opt_vars["z"]),
        "p_plus": np.asarray(opt_vars["p"]),
        "image": np.asarray(final_img),
        "perceptual_trace": np.asarray(traces[0])[::pcfg.trace_every],
        "noise_trace": np.asarray(traces[1])[::pcfg.trace_every],
        "mse_trace": np.asarray(traces[2])[::pcfg.trace_every],
    }
    if pcfg.optimize_noise:
        result["noises"] = [np.asarray(n) for n in opt_vars["noises"]]
    return result
