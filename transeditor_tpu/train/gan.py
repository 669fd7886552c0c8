"""Adversarial training step (StyleGAN2 recipe on the dual-space model).

Reference loop: ``train_spatial_query.py:125-371`` — alternating D/G
steps with lazy R1 (every 16 iters) and lazy path-length
regularisation (every 4 iters), G-EMA, Adam with reg-ratio-scaled
lr/betas (:461-473).

TPU-native structure:
  * one pure ``train_step(state, real, rng)`` per (do_d_reg, do_g_reg)
    static combination — four compiled programs, no data-dependent
    Python in the hot path;
  * both regularizers are grad-of-grad: JAX composes the second order
    automatically (the reference needs hand-written double-backward
    CUDA graphs for this, SURVEY.md §2.1);
  * under a (data, model) mesh the batch shards over ``data`` and XLA
    inserts the gradient psum — the DDP/NCCL analogue with zero
    explicit communication code.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.models import Discriminator, Generator
from transeditor_tpu.train import losses
from transeditor_tpu.utils.sampling import sample_zp

f32 = jnp.float32


class GANTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    params_d: Any
    g_ema: Any
    opt_g: Any
    opt_d: Any
    mean_path_length: jax.Array
    mean_spatial_path_length: jax.Array


def make_optimizers(tcfg: TrainConfig):
    """Adam with lazy-regularisation lr/beta scaling (reference :461-473)."""
    g_ratio = tcfg.g_reg_every / (tcfg.g_reg_every + 1)
    d_ratio = tcfg.d_reg_every / (tcfg.d_reg_every + 1)
    g_opt = optax.adam(tcfg.lr * g_ratio, b1=0.0 ** g_ratio,
                       b2=0.99 ** g_ratio)
    d_opt = optax.adam(tcfg.lr * d_ratio, b1=0.0 ** d_ratio,
                       b2=0.99 ** d_ratio)
    return g_opt, d_opt


def init_state(cfg: ModelConfig, tcfg: TrainConfig, rng: jax.Array,
               gen: Optional[Generator] = None,
               disc: Optional[Discriminator] = None) -> GANTrainState:
    gen = gen or Generator(cfg)
    disc = disc or Discriminator(cfg)
    kg, kd, kn = jax.random.split(rng, 3)
    z = jnp.zeros((1, cfg.n_tokens, cfg.style_dim))
    p = jnp.zeros((1, cfg.n_tokens, cfg.param_dim))
    rngs = {"params": kg}
    if cfg.layer_noise_injection:
        rngs["noise"] = kn
    params_g = gen.init(rngs, z, p)["params"]
    params_d = disc.init(kd, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]
    g_opt, d_opt = make_optimizers(tcfg)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        g_ema=jax.tree.map(jnp.copy, params_g),
        opt_g=g_opt.init(params_g),
        opt_d=d_opt.init(params_d),
        mean_path_length=jnp.zeros((), f32),
        mean_spatial_path_length=jnp.zeros((), f32),
    )


def _accum_mean(fn: Callable, xs, length: int):
    """Mean of ``fn``'s outputs over ``length`` microbatches via scan.

    ``fn(*x)`` must return a pytree whose leaves are already means over
    the microbatch (losses, score means, grads of mean losses) — the
    mean over equal-size microbatches then equals the full-batch value
    EXACTLY (linearity of the gradient of a mean loss), so accumulation
    changes memory, not numerics.

    The running sum lives in the scan CARRY (one gradient-sized buffer),
    not in stacked scan outputs — stacking would materialize K copies of
    the gradient pytree and hand back the memory the microbatching saved.
    """
    x0 = jax.tree.map(lambda t: t[0], xs)
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                         jax.eval_shape(fn, *x0))

    def body(acc, x):
        return jax.tree.map(jnp.add, acc, fn(*x)), None

    total, _ = jax.lax.scan(body, zeros, xs, length=length)
    return jax.tree.map(lambda t: t / length, total)


def make_train_step(cfg: ModelConfig, tcfg: TrainConfig,
                    gen: Optional[Generator] = None,
                    disc: Optional[Discriminator] = None,
                    donate: bool = False, mesh=None) -> Callable:
    """Build the pure train step.  Call with static (do_d_reg, do_g_reg).

    ``mesh``: on a multi-device mesh, every INTERNALLY SAMPLED batch
    (G-step latents, path-reg latents, path noise images) is
    constrained to shard over the 'data' axis.  Without the
    constraint GSPMD is free to keep those branches replicated —
    ``real`` is the only sharded input, and sharding does not
    propagate INTO a program's random-bits sources — and on the
    deviceless XLA:TPU AOT compile of the dp8 flagship step it did
    exactly that: per-device FLOPs ~1.9x the sharded cost and batch-64
    path-reg activations materialized whole per chip, blowing the
    16 GB HBM budget (round 5; invisible to the resharding-warning
    gate because replication emits no warning).

    ``donate=True`` donates the input state's buffers to the step so
    XLA updates params/optimizer state in place (halves the state's
    peak HBM footprint).  The caller must not read the passed-in state
    afterwards — the training loop's ``state = step(state, ...)``
    pattern satisfies this; tests that compare before/after trees must
    keep the default.

    ``tcfg.grad_accum = K > 1`` splits the D loss, R1 penalty and G
    loss over K sequential microbatches (``lax.scan``) and applies the
    averaged gradient once — activation memory scales with B/K while
    the optimizer trajectory matches the full-batch step exactly (the
    losses are batch means, so mean-of-microbatch-grads == full-batch
    grad; only the RNG consumption differs: fresh latents are drawn
    per microbatch).  The path-length regularizers stay single-shot —
    their memory knob is the reference's own ``path_batch_shrink``
    (train_spatial_query.py:229), and the running path-mean penalty is
    a batch-global statistic that cannot be microbatched exactly.
    """
    gen = gen or Generator(cfg)
    disc = disc or Discriminator(cfg)
    g_opt, d_opt = make_optimizers(tcfg)

    def g_forward(params_g, z, p, key):
        rngs = {"noise": key} if cfg.layer_noise_injection else None
        return gen.apply({"params": params_g}, z, p, rngs=rngs)

    def d_forward(params_d, img):
        return disc.apply({"params": params_d}, img)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        _data_sharded = NamedSharding(mesh, PartitionSpec("data"))

        def constrain(x):
            return jax.lax.with_sharding_constraint(x, _data_sharded)
    else:
        def constrain(x):
            return x

    def sample(key, batch):
        z, p = sample_zp(key, batch, cfg.n_tokens, cfg.style_dim)
        return constrain(z), constrain(p)

    # ---------------- D ----------------

    def d_loss_fn(params_d, params_g, real, key):
        kz, kn = jax.random.split(key)
        z, p = sample(kz, real.shape[0])
        fake = g_forward(params_g, z, p, kn).image
        fake_pred = d_forward(params_d, jax.lax.stop_gradient(fake))
        real_pred = d_forward(params_d, real)
        loss = losses.d_logistic_loss(real_pred.astype(f32),
                                      fake_pred.astype(f32))
        return loss, (jnp.mean(real_pred), jnp.mean(fake_pred))

    def d_r1_loss_fn(params_d, real):
        r1 = losses.r1_penalty(
            lambda p_, img: d_forward(p_, img), params_d, real)
        # reference weighting: r1/2 * penalty * d_reg_every (:204)
        return tcfg.r1_gamma / 2 * r1 * tcfg.d_reg_every, r1

    # ---------------- G ----------------

    def g_loss_fn(params_g, params_d, batch, key):
        kz, kn = jax.random.split(key)
        z, p = sample(kz, batch)
        fake = g_forward(params_g, z, p, kn).image
        return losses.g_nonsaturating_loss(
            d_forward(params_d, fake).astype(f32))

    def g_path_loss_fn(params_g, z, p, noise_img, mean_pl, key):
        variables = {"params": params_g}
        z_plus, p_plus = gen.apply(variables, z, p, method="map_codes")
        tokens = gen.apply(variables, z_plus, p_plus,
                           method="interact_codes")
        latent = gen.apply(variables, tokens, method="style_latents_from")
        rngs = {"noise": key} if cfg.layer_noise_injection else None

        def synth(lat):
            return gen.apply(variables, p_plus, lat, method="synthesize",
                             rngs=rngs)

        penalty, path_mean, path_lengths = losses.path_length_penalty(
            synth, latent, noise_img, mean_pl)
        weighted = tcfg.path_regularize * tcfg.g_reg_every * penalty
        return weighted, (path_mean, jnp.mean(path_lengths), penalty)

    def g_spatial_path_loss_fn(params_g, z, p, noise_img, mean_spl, key):
        """Optional P/P+ path regularizer (reference :252-285)."""
        variables = {"params": params_g}
        if tcfg.regu_space == "p":
            def img_fn(p_in):
                return g_forward(params_g, z, p_in, key).image
            target = p
        else:  # "p+"
            def img_fn(pp):
                out = gen.apply(variables, z, pp, map_p=False,
                                rngs=({"noise": key}
                                      if cfg.layer_noise_injection else None))
                return out.image
            target = gen.apply(variables, p, method="map_p")

        def proj(t):
            return jnp.sum(img_fn(t).astype(f32) * noise_img)

        grad = jax.grad(proj)(target).astype(f32)
        # the reference reuses g_path_regularize (:92-105) whose
        # .sum(2).mean(1) on ITS [B, 512ch, 16tok] P layout is
        # sum-over-TOKENS, mean-over-FEATURES — in our [B, T, D]
        # layout that is sum(axis=1), mean(axis=-1) (the swapped
        # reduction is off by a constant sqrt(D/T))
        path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad ** 2, axis=1),
                                         axis=-1))
        path_mean = mean_spl + 0.01 * (jnp.mean(path_lengths) - mean_spl)
        # path_mean is NOT detached inside the penalty (g_path_regularize
        # backprops through the running-mean update term)
        penalty = jnp.mean((path_lengths - path_mean) ** 2)
        weighted = tcfg.spatial_path_regularize * tcfg.g_reg_every * penalty
        return weighted, (jax.lax.stop_gradient(path_mean),
                          jnp.mean(path_lengths), penalty)

    # ---------------- the step ----------------

    jit_kwargs = dict(static_argnames=("do_d_reg", "do_g_reg",
                                       "do_spatial_reg"))
    if donate:
        jit_kwargs["donate_argnums"] = (0,)

    @functools.partial(jax.jit, **jit_kwargs)
    def train_step(state: GANTrainState, real: jax.Array, rng: jax.Array,
                   do_d_reg: bool = False, do_g_reg: bool = False,
                   do_spatial_reg: bool = False):
        if real.dtype == jnp.uint8:
            # normalize on device: uint8 batches are 4x cheaper to ship
            # host->device than pre-normalized float32
            real = real.astype(jnp.float32) / 127.5 - 1.0
        metrics = {}
        k_d, k_g, k_path, k_pnoise, k_sp, k_spn = jax.random.split(rng, 6)

        n_accum = max(1, int(tcfg.grad_accum))
        if real.shape[0] % n_accum:
            raise ValueError(
                f"grad_accum={n_accum} must divide the per-step batch "
                f"{real.shape[0]}")
        micro_b = real.shape[0] // n_accum

        # --- D step
        if n_accum > 1:
            micro_real = real.reshape(n_accum, micro_b, *real.shape[1:])
            (d_loss, (real_score, fake_score)), d_grads = _accum_mean(
                lambda r, kk: jax.value_and_grad(d_loss_fn, has_aux=True)(
                    state.params_d, state.params_g, r, kk),
                (micro_real, jax.random.split(k_d, n_accum)), n_accum)
        else:
            (d_loss, (real_score, fake_score)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_d, state.params_g,
                                         real, k_d)
        upd, opt_d = d_opt.update(d_grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, upd)
        metrics.update(d=d_loss, real_score=real_score,
                       fake_score=fake_score)

        # --- lazy R1
        if do_d_reg:
            if n_accum > 1:
                (_, r1), r1_grads = _accum_mean(
                    lambda r: jax.value_and_grad(d_r1_loss_fn, has_aux=True)(
                        params_d, r),
                    (micro_real,), n_accum)
            else:
                (_, r1), r1_grads = jax.value_and_grad(
                    d_r1_loss_fn, has_aux=True)(params_d, real)
            upd, opt_d = d_opt.update(r1_grads, opt_d, params_d)
            params_d = optax.apply_updates(params_d, upd)
            metrics["r1"] = r1
        else:
            metrics["r1"] = jnp.zeros((), f32)

        # --- G step
        if n_accum > 1:
            g_loss, g_grads = _accum_mean(
                lambda kk: jax.value_and_grad(g_loss_fn)(
                    state.params_g, params_d, micro_b, kk),
                (jax.random.split(k_g, n_accum),), n_accum)
        else:
            g_loss, g_grads = jax.value_and_grad(g_loss_fn)(
                state.params_g, params_d, real.shape[0], k_g)
        upd, opt_g = g_opt.update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd)
        metrics["g"] = g_loss

        # --- lazy path-length reg
        mean_pl = state.mean_path_length
        if do_g_reg:
            path_batch = max(1, real.shape[0] // tcfg.path_batch_shrink)
            kz, kn = jax.random.split(k_path)
            z, p = sample(kz, path_batch)
            noise_img = constrain(losses.path_noise(
                k_pnoise, (path_batch, cfg.size, cfg.size, 3)))
            (_, (mean_pl, path_len, path_pen)), pg = jax.value_and_grad(
                g_path_loss_fn, has_aux=True)(
                    params_g, z, p, noise_img, state.mean_path_length, kn)
            upd, opt_g = g_opt.update(pg, opt_g, params_g)
            params_g = optax.apply_updates(params_g, upd)
            metrics.update(path=path_pen, path_length=path_len)
        else:
            metrics.update(path=jnp.zeros((), f32),
                           path_length=jnp.zeros((), f32))

        # --- optional spatial path reg
        mean_spl = state.mean_spatial_path_length
        if do_spatial_reg:
            path_batch = max(1, real.shape[0] // tcfg.path_batch_shrink)
            kz, kn2 = jax.random.split(k_sp)
            z, p = sample(kz, path_batch)
            noise_img = constrain(losses.path_noise(
                k_spn, (path_batch, cfg.size, cfg.size, 3)))
            (_, (mean_spl, spl_len, spl_pen)), spg = jax.value_and_grad(
                g_spatial_path_loss_fn, has_aux=True)(
                    params_g, z, p, noise_img,
                    state.mean_spatial_path_length, kn2)
            upd, opt_g = g_opt.update(spg, opt_g, params_g)
            params_g = optax.apply_updates(params_g, upd)
            metrics.update(spatial_path=spl_pen, spatial_path_length=spl_len)
        else:
            metrics.update(spatial_path=jnp.zeros((), f32),
                           spatial_path_length=jnp.zeros((), f32))

        # --- EMA (reference accumulate(), decay 0.5**(32/10000) :56-61,160)
        decay = tcfg.ema_decay
        g_ema = jax.tree.map(lambda e, q: e * decay + q * (1 - decay),
                             state.g_ema, params_g)

        new_state = state.replace(
            step=state.step + 1, params_g=params_g, params_d=params_d,
            g_ema=g_ema, opt_g=opt_g, opt_d=opt_d,
            mean_path_length=mean_pl, mean_spatial_path_length=mean_spl)
        return new_state, metrics

    return train_step
