"""Encoder-inversion trainer (the pSp Coach).

Reference: ``pSp/training/coach_new.py`` — forward-invert real images
through encoder+frozen decoder, weighted loss
λ_id·ArcFace + λ_l2·MSE + λ_lpips·LPIPS (+ crop variants + w-norm,
:285-320), optional decode-re-encode "fake guidance" MSE in latent
space every ``fake_every`` steps (:138-152,279-282), Ranger optimizer
(:225-233), periodic validation with best-checkpoint selection
(:165-175).

TPU-native: pure jitted steps (train / fake-guidance / eval); the
decoder is frozen — only encoder params are differentiated; BatchNorm
statistics thread through the 'batch_stats' collection.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models.psp import GradualStyleEncoder, PSPModel
from transeditor_tpu.train.ranger import ranger_simple
from transeditor_tpu.utils.sampling import sample_zp
from transeditor_tpu.zoo.lpips import LPIPS


@dataclasses.dataclass(frozen=True)
class CoachConfig:
    """Loss weights / schedule (psp_training_options.py defaults)."""

    max_steps: int = 500_000
    batch_size: int = 8
    learning_rate: float = 1e-4
    optim_name: str = "ranger"
    lpips_lambda: float = 0.8
    id_lambda: float = 0.1
    l2_lambda: float = 1.0
    lpips_lambda_crop: float = 0.0
    l2_lambda_crop: float = 0.0
    w_norm_lambda: float = 0.0
    use_fake_lambda: float = 0.0
    fake_every: int = 10          # psp_training_options.py:86
    val_interval: int = 2500
    save_interval: int = 10_000
    start_from_latent_avg: bool = True
    from_plus_space: bool = True


class CoachState(flax.struct.PyTreeNode):
    step: jax.Array
    enc_params: Any
    enc_stats: Any          # batch_stats
    opt_state: Any
    best_val_loss: jax.Array


def face_crop(img):
    """The ArcFace alignment crop (id_loss.py:17-21; NCHW rows 35:223,
    cols 32:220 -> NHWC).  Like the reference, it assumes >=224px
    inputs — fail loudly instead of slicing to an empty map."""
    if img.shape[1] < 224 or img.shape[2] < 224:
        raise ValueError(
            f"ArcFace face_crop needs >=224px images, got "
            f"{img.shape[1]}x{img.shape[2]} — the ID metric is defined "
            f"on 256px outputs (reference id_loss.py:17-21)")
    return img[:, 35:223, 32:220, :]


def resize_112(img):
    """AdaptiveAvgPool2d((112,112)) exactly — the reference face_pool
    (id_loss.py:14) pools the 188x188 crop, it does not resize."""
    from transeditor_tpu.zoo.backbones import adaptive_avg_pool_2d
    return adaptive_avg_pool_2d(img, (112, 112))


def make_coach(cfg: ModelConfig, ccfg: CoachConfig, dec_params,
               lpips_params, id_apply: Optional[Callable] = None,
               latent_avg=None):
    """Build (init_fn, train_step, eval_step, fake_step).

    ``id_apply(imgA, imgB) -> (loss, sim_improvement)`` is pluggable so
    the ArcFace weights are optional (id_lambda=0 without them).
    """
    psp = PSPModel.create(cfg, train_encoder=True)
    encoder = psp.encoder                      # BN in training mode
    encoder_eval = GradualStyleEncoder(train=False)
    lpips = LPIPS(net="alex")

    # Frozen weight trees (decoder / LPIPS / ArcFace / latent avg) ride
    # through the jitted steps as ARGUMENTS, not closure constants —
    # numpy closures embed as HLO constants (hundreds of MB of compile
    # payload for real checkpoints) and recompile per checkpoint.
    id_fn = getattr(id_apply, "fn", None)
    if id_fn is None and id_apply is not None:
        id_fn = lambda _, a, b: id_apply(a, b)      # plain callable
    frozen0 = {
        "dec": jax.tree.map(jnp.asarray, dec_params),
        "lpips": jax.tree.map(jnp.asarray, lpips_params),
        "avg": (jax.tree.map(jnp.asarray, tuple(latent_avg))
                if latent_avg is not None else ()),
        "id": jax.tree.map(jnp.asarray, getattr(id_apply, "params", ())),
    }
    has_avg = latent_avg is not None

    if ccfg.optim_name == "ranger":
        opt = ranger_simple(ccfg.learning_rate)
    else:
        opt = optax.adam(ccfg.learning_rate)

    def init_fn(key) -> CoachState:
        img = jnp.zeros((1, cfg.size, cfg.size, 3))
        variables = encoder.init(key, img)
        enc_params = variables["params"]
        enc_stats = variables.get("batch_stats", {})
        return CoachState(step=jnp.zeros((), jnp.int32),
                          enc_params=enc_params, enc_stats=enc_stats,
                          opt_state=opt.init(enc_params),
                          best_val_loss=jnp.asarray(jnp.inf))

    def forward(frozen, enc_params, enc_stats, images, train: bool):
        variables = {"params": enc_params, "batch_stats": enc_stats}
        if train:
            (z, p), new_model_state = encoder.apply(
                variables, images, mutable=["batch_stats"])
        else:
            z, p = encoder_eval.apply(variables, images)
            new_model_state = {"batch_stats": enc_stats}
        if ccfg.start_from_latent_avg and has_avg:
            z = z + frozen["avg"][0][None]
            p = p + frozen["avg"][1][None]
        img = psp.decode(frozen["dec"], z, p,
                         from_plus_space=ccfg.from_plus_space)
        return img, z, p, new_model_state["batch_stats"]

    def losses(frozen, inversed, real, z, p):
        f32 = jnp.float32
        inv = inversed.astype(f32)
        real = real.astype(f32)
        loss = jnp.zeros((), f32)
        logs = {}
        if ccfg.id_lambda > 0 and id_fn is not None:
            loss_id, improve = id_fn(frozen["id"], inv, real)
            logs["loss_id"] = loss_id
            logs["id_improve"] = improve
            loss = loss + ccfg.id_lambda * loss_id
        if ccfg.l2_lambda > 0:
            l2 = jnp.mean((inv - real) ** 2)
            logs["loss_l2"] = l2
            loss = loss + ccfg.l2_lambda * l2
        if ccfg.lpips_lambda > 0:
            lp = jnp.mean(lpips.apply(frozen["lpips"], inv, real))
            logs["loss_lpips"] = lp
            loss = loss + ccfg.lpips_lambda * lp
        if ccfg.lpips_lambda_crop > 0:
            lp = jnp.mean(lpips.apply(frozen["lpips"], face_crop(inv),
                                      face_crop(real)))
            logs["loss_lpips_crop"] = lp
            loss = loss + ccfg.lpips_lambda_crop * lp
        if ccfg.l2_lambda_crop > 0:
            l2 = jnp.mean((face_crop(inv) - face_crop(real)) ** 2)
            logs["loss_l2_crop"] = l2
            loss = loss + ccfg.l2_lambda_crop * l2
        if ccfg.w_norm_lambda > 0 and has_avg:
            wn = (jnp.mean(jnp.linalg.norm(z - frozen["avg"][0][None],
                                           axis=-1))
                  + jnp.mean(jnp.linalg.norm(p - frozen["avg"][1][None],
                                             axis=-1)))
            logs["loss_w_norm"] = wn
            loss = loss + ccfg.w_norm_lambda * wn
        logs["loss"] = loss
        return loss, logs

    @jax.jit
    def train_step(frozen, state: CoachState, real: jax.Array):
        def loss_fn(enc_params):
            inv, z, p, new_stats = forward(frozen, enc_params,
                                           state.enc_stats,
                                           real, train=True)
            loss, logs = losses(frozen, inv, real, z, p)
            return loss, (logs, new_stats, inv)

        (_, (logs, new_stats, inv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.enc_params)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.enc_params)
        enc_params = optax.apply_updates(state.enc_params, updates)
        return state.replace(step=state.step + 1, enc_params=enc_params,
                             enc_stats=new_stats, opt_state=opt_state), \
            logs, inv

    @jax.jit
    def fake_guidance_step(frozen, state: CoachState, key: jax.Array):
        """Sample (Z+,P+) -> decode -> re-encode -> latent MSE
        (coach_new.py:138-152,279-282)."""
        z, p = sample_zp(key, ccfg.batch_size, cfg.n_tokens, cfg.style_dim)
        gen = psp.decoder
        z_plus, p_plus = gen.apply(frozen["dec"], z, p,
                                   method="map_codes")
        fake = psp.decode(frozen["dec"], z_plus, p_plus,
                          from_plus_space=True)
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(enc_params):
            _, zc, pc, new_stats = forward(frozen, enc_params,
                                           state.enc_stats,
                                           fake, train=True)
            # latent MSE in f32 regardless of the compute dtype: the
            # reference computes this loss in torch f32, and a bf16 MSE
            # quantizes the logged value to ±0.002 — below the
            # resolution needed to see the term learn (VERDICT r4 #4)
            f32 = jnp.float32
            loss = (jnp.mean((z_plus.astype(f32) - zc.astype(f32)) ** 2)
                    + jnp.mean((p_plus.astype(f32) - pc.astype(f32)) ** 2))
            return ccfg.use_fake_lambda * loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.enc_params)
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.enc_params)
        enc_params = optax.apply_updates(state.enc_params, updates)
        return state.replace(enc_params=enc_params, enc_stats=new_stats,
                             opt_state=opt_state), loss

    @jax.jit
    def eval_step(frozen, state: CoachState, real: jax.Array):
        inv, z, p, _ = forward(frozen, state.enc_params, state.enc_stats,
                               real, train=False)
        _, logs = losses(frozen, inv, real, z, p)
        return logs, inv

    return (init_fn,
            lambda state, real: train_step(frozen0, state, real),
            lambda state, real: eval_step(frozen0, state, real),
            lambda state, key: fake_guidance_step(frozen0, state, key))


class IdLoss:
    """id_apply with its ArcFace weights exposed as (fn, params) so the
    coach can route them through jit boundaries as arguments."""

    def __init__(self, fn, params):
        self.fn = fn                       # fn(params, inv, real)
        self.params = params

    def __call__(self, inversed, real):
        return self.fn(self.params, inversed, real)


def make_arcface_id_loss(arcface_apply, arcface_vars):
    """Build id_apply from an ArcFace embedder (id_loss.py:8-45)."""

    def id_apply(av, inversed, real):
        f_inv = arcface_apply(av, resize_112(face_crop(inversed)))
        f_real = arcface_apply(av, resize_112(face_crop(real)))
        sim = jnp.sum(f_inv * f_real, axis=-1)
        # improvement vs. the identity similarity of real with itself
        loss = jnp.mean(1.0 - sim)
        improve = jnp.mean(sim - 1.0)
        return loss, improve

    return IdLoss(id_apply, arcface_vars)
