"""Editing sweeps: score 150k samples, train boundaries, edit strips.

Reference drivers: ``our_interfaceGAN/edit_all_noinversion_ffhq.py``
(and the inversion / CelebA-HQ variants): generate ``num_sample``
(150k) random (Z+, P+) pairs, decode from plus space, score each image
with an attribute classifier (:100-149), train linear-SVM boundaries in
the flattened Z+ and P+ spaces (:153-168), then edit 8 samples along
p+/z+/pz+ directions over 61 steps per per-attribute distance configs,
re-scoring each edited image (:179-286).

TPU-native: the scoring fan-out runs as one jitted
sample->map->decode->score program per batch; the edit phase decodes a
whole interpolation strip per device call.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.edit.boundary import linear_interpolate, train_boundary
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.image import make_grid, save_png, to_uint8
from transeditor_tpu.utils.sampling import sample_zp


def _latent_store(n: int, dim: int, store: str, mem_budget_bytes: int,
                  memmap_dir: Optional[str]) -> np.ndarray:
    """[n, dim] float32 accumulator: RAM if it fits the budget, else an
    unlinked-on-close tempfile memmap.  At the reference protocol scale
    (150k x 8192 x 2 trees = 9.8 GB) the list-concatenate pattern OOMs
    production hosts, so the sweep streams batches straight into this
    (reference edit_all_noinversion_ffhq.py:100-149 has the same flaw)."""
    nbytes = n * dim * 4
    if store == "ram" or (store == "auto" and nbytes <= mem_budget_bytes):
        return np.empty((n, dim), np.float32)
    import tempfile
    f = tempfile.NamedTemporaryFile(
        prefix="sweep_latents_", suffix=".f32", dir=memmap_dir)
    mm = np.memmap(f, dtype=np.float32, mode="w+", shape=(n, dim))
    mm._tmpfile = f  # keep the fd alive; file unlinks when mm dies
    return mm


def collect_scored_latents(
    cfg: ModelConfig, gen_params, scorer: Callable,
    n_samples: int = 150_000, batch: int = 64, truncation: float = 1.0,
    seed: int = 0, progress: Optional[Callable[[int], None]] = None,
    store: str = "auto", mem_budget_bytes: int = 1 << 30,
    memmap_dir: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (z_plus_flat [N, 16*512], p_plus_flat, scores [N]).

    ``store``: 'ram' | 'memmap' | 'auto' (memmap once the two latent
    trees would exceed ``mem_budget_bytes``).  Batches stream directly
    into the preallocated store, so peak host RAM stays at
    O(batch + budget) even for the 150k-sample protocol."""
    gen = Generator(cfg)
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    score_fn, score_params = _scorer_parts(scorer)

    # weight trees are jit ARGUMENTS: closing over numpy trees embeds
    # them as HLO constants (huge remote-compile payloads, recompile
    # per checkpoint)
    @jax.jit
    def batch_fn(gp, sp, key):
        z, p = sample_zp(key, batch, cfg.n_tokens, cfg.style_dim,
                         truncation)
        zp, pp = gen.apply(gp, z, p, method="map_codes")
        img = gen.apply(gp, zp, pp, map_z=False,
                        map_p=False).image
        return zp, pp, score_fn(sp, img.astype(jnp.float32))

    dim = cfg.n_tokens * cfg.style_dim
    # the budget covers BOTH latent trees
    z = _latent_store(n_samples, dim, store, mem_budget_bytes // 2,
                      memmap_dir)
    p = _latent_store(n_samples, dim, store, mem_budget_bytes // 2,
                      memmap_dir)
    s = np.empty((n_samples,), np.float32)

    key = jax.random.PRNGKey(seed)
    done = 0
    i = 0
    while done < n_samples:
        zp, pp, sb = batch_fn(gen_params, score_params,
                              jax.random.fold_in(key, i))
        n = min(batch, n_samples - done)
        z[done:done + n] = np.asarray(zp)[:n].reshape(n, dim)
        p[done:done + n] = np.asarray(pp)[:n].reshape(n, dim)
        s[done:done + n] = np.asarray(sb)[:n]
        done += n
        i += 1
        if progress:
            progress(done)
    return z, p, s


def train_dual_boundaries(z_flat, p_flat, scores, chosen_ratio=0.02,
                          seed=0) -> Dict[str, np.ndarray]:
    """Both editing directions (the reference trains Z+ and P+ SVMs,
    :153-168)."""
    return {
        "z": train_boundary(z_flat, scores, chosen_ratio, seed=seed),
        "p": train_boundary(p_flat, scores, chosen_ratio, seed=seed),
    }


@dataclasses.dataclass
class EditStrip:
    images: np.ndarray    # [steps, H, W, 3] float in [-1,1]
    scores: np.ndarray    # [steps]
    space: str            # 'pz_plus' | 'p_plus' | 'z_plus'


def _scorer_parts(scorer):
    """(fn(params, img), params) form of a scorer, so its weights can
    ride through an outer jit as arguments (see classifiers.Scorer).
    Plain callables (tests, custom scorers) are wrapped with an empty
    param tree."""
    if scorer is None:
        return (lambda _, img: jnp.zeros(img.shape[0])), ()
    fn = getattr(scorer, "fn", None)
    if fn is not None:
        return fn, scorer.params
    return (lambda _, img: scorer(img)), ()


def make_strip_decoder(cfg: ModelConfig, gen_params,
                       scorer: Optional[Callable] = None):
    """One jitted call: decode a [steps,16,512]x2 strip + scores."""
    gen = Generator(cfg)
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    score_fn, score_params = _scorer_parts(scorer)

    @jax.jit
    def decode(gp, sp, z_strip, p_strip):
        img = gen.apply(gp, z_strip, p_strip, map_z=False,
                        map_p=False).image.astype(jnp.float32)
        return img, score_fn(sp, img)

    return lambda z_strip, p_strip: decode(gen_params, score_params,
                                           z_strip, p_strip)


def edit_sample(decode, z_plus, p_plus, boundaries, style_distance,
                content_distance, steps: int = 61) -> Dict[str, EditStrip]:
    """Edit ONE sample along pz+/p+/z+ (reference :209-270).

    z_plus/p_plus: [16, 512] plus-space codes (sampled or inverted).
    """
    t, d = z_plus.shape
    z_flat = z_plus.reshape(1, -1)
    p_flat = p_plus.reshape(1, -1)

    z_moved = linear_interpolate(z_flat, boundaries["z"], -style_distance,
                                 style_distance, steps).reshape(steps, t, d)
    p_moved = linear_interpolate(p_flat, boundaries["p"], -content_distance,
                                 content_distance, steps).reshape(steps, t, d)
    z_fixed = np.broadcast_to(z_plus[None], (steps, t, d))
    p_fixed = np.broadcast_to(p_plus[None], (steps, t, d))

    out = {}
    for space, (zz, pp) in {
        "pz_plus": (z_moved, p_moved),
        "p_plus": (z_fixed, p_moved),
        "z_plus": (z_moved, p_fixed),
    }.items():
        img, s = decode(jnp.asarray(zz), jnp.asarray(pp))
        out[space] = EditStrip(np.asarray(img), np.asarray(s), space)
    return out


def save_strips(strips: Dict[str, EditStrip], out_dir: str,
                sample_idx: int, attribute: str):
    """PNG per edited frame, predicted score embedded in the filename
    (the reference's assertion mechanism, :249), plus one strip grid."""
    for space, strip in strips.items():
        d = os.path.join(out_dir, space)
        os.makedirs(d, exist_ok=True)
        imgs = to_uint8(strip.images)
        for j in range(imgs.shape[0]):
            save_png(os.path.join(
                d, f"origin_{sample_idx}_edit_{j}_{attribute}_"
                   f"{round(float(strip.scores[j]))}.png"), imgs[j])
        save_png(os.path.join(d, f"strip_{sample_idx}.png"),
                 make_grid(strip.images, nrow=imgs.shape[0], pad=0))


def run_noinversion_sweep(
    cfg: ModelConfig, gen_params, scorer, boundaries, out_dir: str,
    attribute: str, style_distance: float, content_distance: float,
    n_edit_samples: int = 8, steps: int = 61, seed: int = 0,
    truncation: float = 1.0,
):
    """The per-(seed, distance-config) edit phase (:179-286)."""
    gen = Generator(cfg)
    gen_params = jax.tree.map(jnp.asarray, gen_params)

    @jax.jit
    def sample_codes(gp, key):
        z, p = sample_zp(key, n_edit_samples, cfg.n_tokens, cfg.style_dim,
                         truncation)
        zp, pp = gen.apply(gp, z, p, method="map_codes")
        img = gen.apply(gp, z, p).image
        return zp, pp, img

    zp, pp, origin = sample_codes(gen_params, jax.random.PRNGKey(seed))
    os.makedirs(os.path.join(out_dir, "origin_image"), exist_ok=True)
    save_png(os.path.join(out_dir, "origin_image", "sample_gen.png"),
             make_grid(np.asarray(origin, np.float32), nrow=1, pad=0))

    decode = make_strip_decoder(cfg, gen_params, scorer)
    zp, pp = np.asarray(zp), np.asarray(pp)
    for i in range(n_edit_samples):
        strips = edit_sample(decode, zp[i], pp[i], boundaries,
                             style_distance, content_distance, steps)
        save_strips(strips, out_dir, i, attribute)
