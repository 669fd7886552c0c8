"""Evaluator fan-out sharded over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.metrics.evaluator import evaluate_fid
from transeditor_tpu.metrics.inception import InceptionV3Features
from transeditor_tpu.models import Generator
from transeditor_tpu.parallel import create_mesh

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)


def test_fid_eval_on_mesh():
    gen = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    gen_params = gen.init(jax.random.PRNGKey(0), z, z)
    # tiny inception stand-in is too slow; use the real net at 16px
    # input (resize to 299 happens inside) but only 16 samples
    inception = InceptionV3Features()
    inc_params = inception.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 299, 299, 3)))
    mesh = create_mesh(n_data=8, n_model=1)

    rng = np.random.RandomState(0)
    mean, cov = rng.randn(2048) * 0.01, np.eye(2048)

    # the subject here is the mesh-sharded sample->feature program.
    # The Fréchet math itself CANNOT be finite on this input: random
    # inception weights emit ~1e12-scale features (cov ~1e22), whose
    # rank-16 covariance makes sqrtm's numerical noise materially
    # imaginary in the reference's absolute atol-1e-3 sense — its
    # calc_fid raises ValueError on exactly these stats
    # (fid_query.py:54-58; branch parity pinned in test_fid_oracle.py)
    # n_samples=24 @ batch 16: two batches with a partial tail, so the
    # streamed preallocated feature store's truncation path runs too
    import pytest
    with pytest.raises(ValueError, match="Imaginary"):
        evaluate_fid(CFG, gen_params, inc_params, mean, cov,
                     n_samples=24, batch=16, mesh=mesh)


def test_lpips_diversity_three_regimes():
    """evaluate_lpips_diversity runs all three reference regimes; the
    fixed-space regimes must be strictly less diverse than fully
    random, and the same-flags are static jit args (regression for
    TracerBoolConversionError)."""
    from transeditor_tpu.metrics.evaluator import evaluate_lpips_diversity
    from transeditor_tpu.zoo.lpips import LPIPS

    # 32px minimum: at 16px AlexNet's deep stages hit zero spatial
    # size and the LPIPS mean is NaN
    cfg = ModelConfig(size=32, style_dim=32, param_dim=32,
                      max_channels=32, n_trans=1)
    gen = Generator(cfg)
    z = jnp.zeros((1, cfg.n_tokens, cfg.style_dim))
    gp = gen.init(jax.random.PRNGKey(0), z, z)
    lpips = LPIPS(net="alex")
    x0 = jnp.zeros((1, cfg.size, cfg.size, 3))
    lp = lpips.init(jax.random.PRNGKey(1), x0, x0)

    out = evaluate_lpips_diversity(cfg, gp, lp, n_images=6, n_batches=1,
                                   pair_chunk=15)
    assert set(out) == {"all", "fix_z", "fix_p"}
    for v in out.values():
        assert np.isfinite(v) and v >= 0.0

    # a pair_chunk larger than the pair list must clamp, not fail at
    # trace (regression: dynamic_slice of 130 on a 15-pair list)
    out2 = evaluate_lpips_diversity(cfg, gp, lp, n_images=6,
                                    n_batches=1, pair_chunk=130)
    assert np.isfinite(out2["all"])
    # fixing either space removes diversity vs fully-random draws
    assert out["fix_z"] <= out["all"] and out["fix_p"] <= out["all"]
