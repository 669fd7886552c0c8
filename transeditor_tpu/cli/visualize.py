"""Visual smoke-test CLI: sampling / swap / interpolation grids.

Replicates the reference e2e driver ``test_spatial_query.py`` modes
(--sample :20-31, --swap_z/--swap_p :33-72, --interp :75-189,
--dat_interp :116-148,192-225) with TPU-friendly batching: every strip
is ONE jitted device call over the stacked step batch, not a Python
loop of single forwards.

Usage:
  python -m transeditor_tpu.cli.visualize --ckpt path.pt --sample \
      --swap_z --swap_p --interp --dat_interp --out ./generation
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.edit.boundary import linear_interpolate
from transeditor_tpu.io.checkpoint import load_reference_generator
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.image import make_grid, save_png, to_uint8
from transeditor_tpu.utils.sampling import sample_tokens


class Sampler:
    """Jit-cached inference wrapper around a loaded g_ema."""

    def __init__(self, cfg: ModelConfig, params):
        self.cfg = cfg
        self.gen = Generator(cfg)
        self.params = params

    @functools.cached_property
    def _forward(self):
        @functools.partial(jax.jit, static_argnames=("map_z", "map_p",
                                                     "input_is_latent"))
        def fwd(params, z, p, map_z=True, map_p=True,
                input_is_latent=False):
            out = self.gen.apply(params, z, p, map_z=map_z, map_p=map_p,
                                 input_is_latent=input_is_latent)
            return out.image
        return fwd

    def images(self, z, p, **kw):
        return np.asarray(
            self._forward(self.params, jnp.asarray(z), jnp.asarray(p), **kw),
            np.float32)

    @functools.cached_property
    def _map(self):
        @jax.jit
        def f(params, z, p):
            return self.gen.apply(params, z, p, method="map_codes")
        return f

    def map_codes(self, z, p):
        zp, pp = self._map(self.params, jnp.asarray(z), jnp.asarray(p))
        return np.asarray(zp), np.asarray(pp)

    @functools.cached_property
    def _latent(self):
        @jax.jit
        def f(params, z, p):
            return self.gen.apply(params, z, p).latent
        return f

    def style_latents(self, z, p):
        return np.asarray(self._latent(self.params, jnp.asarray(z),
                                       jnp.asarray(p)))


def _key(seed):
    return jax.random.PRNGKey(seed)


def run_sample(s: Sampler, out_dir, n_sample=8, loops=10, truncation=0.7,
               seed=0):
    """64-image grids from fixed P, fresh Z each loop (reference :20-31)."""
    cfg = s.cfg
    p = sample_tokens(_key(seed), n_sample, cfg.n_tokens, cfg.param_dim,
                      truncation)
    for i in range(loops):
        z = sample_tokens(_key(seed + 1 + i), n_sample, cfg.n_tokens,
                          cfg.style_dim, truncation)
        img = s.images(z, p)
        save_png(os.path.join(out_dir, f"{i}.png"),
                 make_grid(img, nrow=int(n_sample ** 0.5)))


def run_swap(s: Sampler, out_dir, which="z", n_sample=8, loops=8,
             truncation=1.0, seed=0):
    """Fix one space, resample the other -> identity/style swap grid."""
    cfg = s.cfg
    # which='z': resample Z each row against a FIXED P (and vice versa)
    fixed_dim = cfg.param_dim if which == "z" else cfg.style_dim
    fresh_dim = cfg.style_dim if which == "z" else cfg.param_dim
    fixed = sample_tokens(_key(seed), n_sample, cfg.n_tokens, fixed_dim,
                          truncation)
    rows = []
    for i in range(loops):
        fresh = sample_tokens(_key(seed + 1 + i), n_sample, cfg.n_tokens,
                              fresh_dim, truncation)
        img = s.images(fresh, fixed) if which == "z" else \
            s.images(fixed, fresh)
        rows.append(img)
    grid = make_grid(np.concatenate(rows), nrow=n_sample, pad=0)
    save_png(os.path.join(out_dir, f"swap_{which}.png"), grid)


def _interp_tokens_along_boundary(base_tokens, boundary, steps=8):
    """Interpolate each of B token sets along a random 512-d boundary,
    batched: returns [B*steps, T, D]."""
    outs = []
    for i in range(base_tokens.shape[0]):
        flat = base_tokens[i:i + 1].reshape(1, -1, base_tokens.shape[-1])
        moved = linear_interpolate(flat, boundary, -1.0, 1.0, steps)
        outs.append(moved.reshape(steps, *base_tokens.shape[1:]))
    return np.concatenate(outs)


def run_interp(s: Sampler, out_dir, space="z", n_rows=8, steps=8,
               truncation=1.0, seed=0, num_tests=3):
    """Boundary interpolation in {z, z+, w, p, p+} (reference :75-189)."""
    cfg = s.cfg
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for j in range(num_tests):
        z = np.asarray(sample_tokens(_key(seed + j), n_rows, cfg.n_tokens,
                                     cfg.style_dim, truncation))
        p = np.asarray(sample_tokens(_key(seed + 100 + j), n_rows,
                                     cfg.n_tokens, cfg.param_dim,
                                     truncation, same=True))
        boundary = rng.randn(1, cfg.style_dim).astype(np.float32)
        boundary /= np.linalg.norm(boundary)

        if space == "z":
            moved = _interp_tokens_along_boundary(z, boundary, steps)
            img = s.images(moved, np.repeat(p[:1], len(moved), 0))
        elif space == "z+":
            zp, _ = s.map_codes(z, p)
            moved = _interp_tokens_along_boundary(zp, boundary, steps)
            img = s.images(moved, np.repeat(p[:1], len(moved), 0),
                           map_z=False)
        elif space == "w":
            w = s.style_latents(z, p)
            moved = _interp_tokens_along_boundary(w, boundary, steps)
            img = s.images(moved, np.repeat(p[:1], len(moved), 0),
                           input_is_latent=True)
        elif space == "p":
            moved = _interp_tokens_along_boundary(
                np.asarray(sample_tokens(_key(seed + 200 + j), n_rows,
                                         cfg.n_tokens, cfg.param_dim,
                                         truncation)), boundary, steps)
            img = s.images(np.repeat(z[:1], len(moved), 0), moved)
        elif space == "p+":
            _, pp = s.map_codes(z, p)
            moved = _interp_tokens_along_boundary(pp, boundary, steps)
            img = s.images(np.repeat(z[:1], len(moved), 0), moved,
                           map_p=False)
        else:
            raise ValueError(space)
        save_png(os.path.join(out_dir, f"interp_{space}_{j}.png"),
                 make_grid(img, nrow=steps))


def run_dat_interp(s: Sampler, out_dir, space="z", n=6, steps=4,
                   truncation=1.0, seed=0, num_tests=3):
    """lerp between two batch-repeated draws (reference :116-148,192-225)."""
    cfg = s.cfg
    os.makedirs(out_dir, exist_ok=True)
    for j in range(num_tests):
        k = seed + 10 * j
        if space in ("z", "z+"):
            a = np.asarray(sample_tokens(_key(k), n, cfg.n_tokens,
                                         cfg.style_dim, truncation,
                                         same=True))
            b = np.asarray(sample_tokens(_key(k + 1), n, cfg.n_tokens,
                                         cfg.style_dim, truncation,
                                         same=True))
            p = np.asarray(sample_tokens(_key(k + 2), n, cfg.n_tokens,
                                         cfg.param_dim, truncation))
            if space == "z+":
                a, _ = s.map_codes(a, p)
                b, _ = s.map_codes(b, p)
            rows = []
            for i in range(steps):
                t = 0.25 * (i + 1)
                zi = a + (b - a) * t
                rows.append(s.images(zi, p, map_z=(space == "z")))
        else:  # p / p+
            z = np.asarray(sample_tokens(_key(k), n, cfg.n_tokens,
                                         cfg.style_dim, truncation))
            a = np.asarray(sample_tokens(_key(k + 1), n, cfg.n_tokens,
                                         cfg.param_dim, truncation,
                                         same=True))
            b = np.asarray(sample_tokens(_key(k + 2), n, cfg.n_tokens,
                                         cfg.param_dim, truncation,
                                         same=True))
            if space == "p+":
                _, a = s.map_codes(z, a)
                _, b = s.map_codes(z, b)
            rows = []
            for i in range(steps):
                t = 0.25 * (i + 1)
                pi = a + (b - a) * t
                rows.append(s.images(z, pi, map_p=(space == "p")))
        save_png(os.path.join(out_dir, f"interp_{space}_{j}.png"),
                 make_grid(np.concatenate(rows), nrow=n))


def run_similarity(s: Sampler, out_dir, n=8, seed=0):
    """Dump per-block, per-head cross-attention similarity heatmaps
    (reference save_similarity, train_spatial_query.py:114-122)."""
    cfg = s.cfg
    z = sample_tokens(_key(seed), n, cfg.n_tokens, cfg.style_dim)
    p = sample_tokens(_key(seed + 1), n, cfg.n_tokens, cfg.param_dim)
    out = s.gen.apply(s.params, jnp.asarray(z), jnp.asarray(p),
                      return_similarity=True)
    os.makedirs(out_dir, exist_ok=True)
    from transeditor_tpu.utils.image import colorize_heatmap
    for layer, sim in enumerate(out.similarity):
        sim = np.asarray(sim, np.float32).mean(axis=0)  # [heads, 16, 16]
        for head in range(sim.shape[0]):
            save_png(os.path.join(out_dir,
                                  f"sim_{layer:02d}_{head:02d}.png"),
                     colorize_heatmap(sim[head]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help=".pt reference bundle or orbax dir")
    ap.add_argument("--out", type=str, default="./generation/visual")
    ap.add_argument("--n_sample", type=int, default=8)
    ap.add_argument("--loop_num", type=int, default=10)
    ap.add_argument("--truncation", type=float, default=1.0)
    ap.add_argument("--sample", action="store_true")
    ap.add_argument("--swap_z", action="store_true")
    ap.add_argument("--swap_p", action="store_true")
    ap.add_argument("--interp", action="store_true")
    ap.add_argument("--dat_interp", action="store_true")
    ap.add_argument("--interp_num", type=int, default=6)
    from transeditor_tpu.cli.common import (add_model_flags,
                                            model_config_from_args)
    add_model_flags(ap, dtype_default="bfloat16")
    args = ap.parse_args(argv)

    cfg = model_config_from_args(args)
    params = load_reference_generator(args.ckpt, cfg)
    s = Sampler(cfg, params)

    os.makedirs(args.out, exist_ok=True)
    if args.sample:
        run_sample(s, args.out, args.n_sample, args.loop_num,
                   truncation=0.7)
    if args.swap_z:
        run_swap(s, args.out, "z", args.n_sample,
                 truncation=args.truncation)
    if args.swap_p:
        run_swap(s, args.out, "p", args.n_sample,
                 truncation=args.truncation)
    if args.interp:
        for space in ("z", "z+", "w", "p", "p+"):
            run_interp(s, os.path.join(args.out, "interp_many", space),
                       space, truncation=args.truncation,
                       num_tests=args.interp_num)
    if args.dat_interp:
        for space in ("z", "z+", "p", "p+"):
            run_dat_interp(s, os.path.join(args.out, "interp_dat", space),
                           space, truncation=args.truncation,
                           num_tests=args.interp_num)
    print("Test done!")


if __name__ == "__main__":
    main()
