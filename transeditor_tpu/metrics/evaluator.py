"""Checkpoint evaluator: FID / LPIPS-diversity / PPL.

Reference CLI: ``metrics/evaluate_query.py`` — per checkpoint, sample
69k (FFHQ) / 29k (CelebA-HQ) images for FID against cached real stats,
1000x40-image LPIPS diversity in three regimes (:94-133), PPL over
{all, p, z} in plus space with crop (:353-364); tracks best FID across
a checkpoint directory (:383-391).

TPU-native: generation+feature extraction is one jitted program per
batch; multi-chip evaluation shards the batch over the mesh 'data'
axis (replacing the reference's nn.DataParallel wrap, :319-329).
"""

from __future__ import annotations

import dataclasses
import pickle
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.metrics.fid import compute_stats, frechet_distance
from transeditor_tpu.metrics.inception import InceptionV3Features
from transeditor_tpu.metrics.ppl import compute_ppl
from transeditor_tpu.models import Generator
from transeditor_tpu.utils.sampling import sample_tokens
from transeditor_tpu.zoo.lpips import LPIPS


def load_real_stats(path: str):
    """Read cached real-data stats ('mean'/'cov' or 'mu'/'sigma') from
    the reference's pickle format (inception_ffhq.pkl,
    fid_query.py:23-37) or an ``.npz`` with the same keys."""
    import zipfile
    try:
        z = np.load(path)
    except (ValueError, OSError, TypeError, zipfile.BadZipFile,
            pickle.UnpicklingError):
        z = None  # not npz/npy — fall through to the pickle format
    if z is not None and not isinstance(z, np.lib.npyio.NpzFile):
        # a bare .npy loads as an ndarray — it cannot hold the two
        # named stats arrays, so treat it like any other non-npz file
        # (the pickle branch below raises a sensible error for it)
        z = None
    if z is not None:
        with z:
            # a successfully-opened npz missing both key spellings is a
            # REAL error in the caller's file — let KeyError propagate
            # rather than masking it as a pickle failure downstream
            mean = z["mean"] if "mean" in z.files else z["mu"]
            cov = z["cov"] if "cov" in z.files else z["sigma"]
            return np.asarray(mean), np.asarray(cov)
    with open(path, "rb") as f:
        stats = pickle.load(f)
    mean = stats.get("mean", stats.get("mu"))
    cov = stats.get("cov", stats.get("sigma"))
    return np.asarray(mean), np.asarray(cov)


def _shard_batch_constraint(x, mesh):
    """Shard a generated batch over the mesh 'data' axis (the
    evaluation-throughput analogue of the reference's nn.DataParallel
    wrap) — XLA splits the whole sample->feature program across chips."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data")))


def evaluate_fid(cfg: ModelConfig, gen_params, inception_params,
                 real_mean, real_cov, n_samples: int = 69_000,
                 batch: int = 64, truncation: float = 1.0,
                 seed: int = 0, mesh=None) -> float:
    gen = Generator(cfg)
    inception = InceptionV3Features()
    # weight trees ride through jit as ARGUMENTS — closing over numpy
    # trees embeds them as HLO constants (huge remote-compile payloads,
    # recompile per checkpoint)
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    inception_params = jax.tree.map(jnp.asarray, inception_params)

    @jax.jit
    def batch_features(gp, ip, key):
        kz, kp = jax.random.split(key)
        z = sample_tokens(kz, batch, cfg.n_tokens, cfg.style_dim,
                          truncation)
        p = sample_tokens(kp, batch, cfg.n_tokens, cfg.param_dim,
                          truncation)
        z = _shard_batch_constraint(z, mesh)
        p = _shard_batch_constraint(p, mesh)
        img = gen.apply(gp, z, p).image.astype(jnp.float32)
        return inception.apply(ip, img)

    key = jax.random.PRNGKey(seed)
    # stream into a preallocated store — list+concatenate doubles the
    # ~0.5 GB peak of the 69k-sample protocol for nothing
    feats = None
    done = 0
    i = 0
    while done < n_samples:
        fb = np.asarray(batch_features(
            gen_params, inception_params, jax.random.fold_in(key, i)))
        if feats is None:
            feats = np.empty((n_samples, fb.shape[1]), np.float32)
        m = min(batch, n_samples - done)
        feats[done:done + m] = fb[:m]
        done += m
        i += 1
    mean, cov = compute_stats(feats)
    return frechet_distance(mean, cov, real_mean, real_cov)


def real_stats_from_source(source, inception_params, resolution: int,
                           n_samples: int = 50_000, batch: int = 64):
    """Precompute real-data FID stats (the calc_inception.py analogue)."""
    inception = InceptionV3Features()
    inception_params = jax.tree.map(jnp.asarray, inception_params)

    # ship uint8 and normalize ON DEVICE: 4x less host->device traffic,
    # and at the 50k protocol the tunnel client was measured retaining
    # upload buffers (~50 MB/batch as float32 -> tens of GB of host RSS
    # over a protocol pass; scripts/protocol_scale.py)
    @jax.jit
    def extract(ip, img_u8):
        img = img_u8.astype(jnp.float32) / 127.5 - 1.0
        return inception.apply(ip, img)

    n = min(n_samples, len(source))
    feats = None
    for start in range(0, n, batch):
        imgs = np.stack([source.get(i, resolution)
                         for i in range(start, min(start + batch, n))])
        fb = np.asarray(extract(inception_params,
                                jnp.asarray(imgs.astype(np.uint8))))
        if feats is None:
            feats = np.empty((n, fb.shape[1]), np.float32)
        feats[start:start + len(fb)] = fb
    return compute_stats(feats)


def make_pairwise_lpips_mean(n_images: int, pair_chunk: int = 130,
                             mesh=None, net: str = "alex"):
    """Mean LPIPS over all unordered image pairs of one group — the
    reference's ``calculate_lpips_given_images`` (evaluate_query.py:
    82-91: pairs (i, j) for i<j, mean over the C(n,2) distances).

    TPU-native: the pairs are evaluated as chunked BATCHED LPIPS calls
    over gathered triu index pairs instead of C(n,2) single-image
    calls.  Returns a traceable ``(lpips_params, images[N,H,W,C]) ->
    scalar`` for use inside jitted programs.
    """
    lpips = LPIPS(net=net)
    iu, ju = np.triu_indices(n_images, k=1)
    iu = jnp.asarray(iu)
    ju = jnp.asarray(ju)
    n_pairs = len(iu)
    # a chunk larger than the pair list can't be sliced — run them all
    # in one chunk instead
    pair_chunk = min(pair_chunk, n_pairs)
    assert n_pairs % pair_chunk == 0, (
        f"pair_chunk {pair_chunk} must divide n_pairs {n_pairs}")

    def pairwise_mean(lp, img):
        def chunk_dist(start):
            ii = jax.lax.dynamic_slice_in_dim(iu, start, pair_chunk)
            jj = jax.lax.dynamic_slice_in_dim(ju, start, pair_chunk)
            a = _shard_batch_constraint(img[ii], mesh)
            b = _shard_batch_constraint(img[jj], mesh)
            return lpips.apply(lp, a, b)

        n_chunks = max(1, n_pairs // pair_chunk)
        dists = [chunk_dist(c * pair_chunk) for c in range(n_chunks)]
        return jnp.mean(jnp.concatenate(dists)[:n_pairs])

    return pairwise_mean


def evaluate_lpips_diversity(cfg: ModelConfig, gen_params, lpips_params,
                             n_images: int = 40, n_batches: int = 1000,
                             truncation: float = 1.0, seed: int = 0,
                             pair_chunk: int = 130,
                             mesh=None) -> Dict[str, float]:
    """Three-regime mean pairwise LPIPS (evaluate_query.py:94-133).

    TPU-native: the 780 pairs per group are evaluated as batched LPIPS
    calls over gathered index pairs instead of 780 single-image calls.
    """
    gen = Generator(cfg)
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    lpips_params = jax.tree.map(jnp.asarray, lpips_params)
    pairwise_mean = make_pairwise_lpips_mean(n_images, pair_chunk, mesh)

    # same-flags select a sampling SHAPE (one draw broadcast vs per-item
    # draws) — a Python-level branch, so they must be static jit args
    @partial(jax.jit, static_argnames=("z_same", "p_same"))
    def group_diversity(gp, lp, key, z_same, p_same):
        kz, kp = jax.random.split(key)
        z = sample_tokens(kz, n_images, cfg.n_tokens, cfg.style_dim,
                          truncation, same=z_same)
        p = sample_tokens(kp, n_images, cfg.n_tokens, cfg.param_dim,
                          truncation, same=p_same)
        img = gen.apply(gp, z, p).image.astype(jnp.float32)
        return pairwise_mean(lp, img)

    key = jax.random.PRNGKey(seed)
    sums = {"all": 0.0, "fix_z": 0.0, "fix_p": 0.0}
    for b in range(n_batches):
        k = jax.random.fold_in(key, b)
        k1, k2, k3 = jax.random.split(k, 3)
        # regime labels follow the reference exactly: its "fix_z"
        # accumulates the P-fixed draws and "fix_p" the Z-fixed ones
        # (evaluate_query.py:116-128)
        sums["all"] += float(group_diversity(gen_params, lpips_params,
                                             k1, z_same=False, p_same=False))
        sums["fix_z"] += float(group_diversity(gen_params, lpips_params,
                                               k2, z_same=False, p_same=True))
        sums["fix_p"] += float(group_diversity(gen_params, lpips_params,
                                               k3, z_same=True, p_same=False))
    return {k: v / n_batches for k, v in sums.items()}


def evaluate_prdc(cfg: ModelConfig, gen_params, vgg_params, real_source,
                  n_samples: int = 50_000, batch: int = 64,
                  nearest_k: int = 3, seed: int = 0,
                  mesh=None) -> Dict[str, float]:
    """PRDC protocol (metrics/calc_prdc.py:69-122): VGG16-fc7 features
    of n generated vs n real images, k=3 manifold estimation."""
    from transeditor_tpu.metrics.prdc import compute_prdc
    from transeditor_tpu.zoo.backbones import VGG16Fc7

    gen = Generator(cfg)
    vgg = VGG16Fc7()
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    vgg_params = jax.tree.map(jnp.asarray, vgg_params)

    @jax.jit
    def gen_features(gp, vp, key):
        kz, kp = jax.random.split(key)
        z = sample_tokens(kz, batch, cfg.n_tokens, cfg.style_dim)
        p = sample_tokens(kp, batch, cfg.n_tokens, cfg.param_dim)
        z = _shard_batch_constraint(z, mesh)
        p = _shard_batch_constraint(p, mesh)
        img = gen.apply(gp, z, p).image.astype(jnp.float32)
        # the reference feeds vgg16 at NATIVE size (no 224 resize,
        # calc_prdc.py:17-29) — the adaptive pool handles 8x8 -> 7x7
        return vgg.apply(vp, img)

    # uint8 upload + on-device normalize (see real_stats_from_source)
    @jax.jit
    def real_features(vp, img_u8):
        img = img_u8.astype(jnp.float32) / 127.5 - 1.0
        return vgg.apply(vp, img)

    key = jax.random.PRNGKey(seed)
    n = min(n_samples, len(real_source))
    # stream straight into preallocated stores — at the 50k protocol
    # the list+concatenate pattern doubles peak host RAM for nothing
    fake = real = None
    done = 0
    i = 0
    while done < n:
        m = min(batch, n - done)
        fb = np.asarray(gen_features(gen_params, vgg_params,
                                     jax.random.fold_in(key, i)))
        imgs = np.stack([real_source.get(j, cfg.size)
                         for j in range(done, done + m)])
        rb = np.asarray(real_features(
            vgg_params, jnp.asarray(imgs.astype(np.uint8))))
        if fake is None:
            fake = np.empty((n, fb.shape[1]), np.float32)
            real = np.empty((n, rb.shape[1]), np.float32)
        fake[done:done + m] = fb[:m]
        real[done:done + m] = rb[:m]
        done += m
        i += 1
    return compute_prdc(real, fake, nearest_k)


@dataclasses.dataclass
class EvalReport:
    fid: Optional[float] = None
    lpips: Optional[Dict[str, float]] = None
    ppl: Optional[Dict[str, float]] = None


def evaluate_checkpoint(cfg: ModelConfig, gen_params, *,
                        inception_params=None, real_stats=None,
                        lpips_params=None, ppl_lpips_params=None,
                        do_fid=False, do_lpips=False,
                        do_ppl=False, fid_samples=69_000,
                        lpips_batches=1000, ppl_samples=10_000,
                        batch=64, ppl_slerp=False) -> EvalReport:
    """The reference uses two DIFFERENT perceptual nets: AlexNet LPIPS
    for the diversity metric (evaluate_query.py:97, metrics/lpips.py)
    and richzhang net-lin VGG for PPL (:139-140) — so the two protocols
    take separate param trees (``lpips_params`` = alex,
    ``ppl_lpips_params`` = vgg)."""
    report = EvalReport()
    if do_fid:
        assert inception_params is not None and real_stats is not None
        report.fid = evaluate_fid(cfg, gen_params, inception_params,
                                  *real_stats, n_samples=fid_samples,
                                  batch=batch)
    if do_lpips:
        assert lpips_params is not None
        report.lpips = evaluate_lpips_diversity(
            cfg, gen_params, lpips_params, n_batches=lpips_batches)
    if do_ppl:
        assert ppl_lpips_params is not None
        report.ppl = {
            space: compute_ppl(cfg, gen_params, ppl_lpips_params,
                               space=space, eval_plus=True, crop=True,
                               use_slerp=ppl_slerp,
                               n_samples=ppl_samples, batch=batch)
            for space in ("all", "p", "z")}
    return report
