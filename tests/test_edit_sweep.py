"""End-to-end editing pipeline on a tiny model: score -> boundaries ->
strips (the edit_all_noinversion flow, miniaturised)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.edit.sweep import (collect_scored_latents,
                                        edit_sample, make_strip_decoder,
                                        run_noinversion_sweep,
                                        train_dual_boundaries)
from transeditor_tpu.models import Generator

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)


@pytest.fixture(scope="module")
def gen_params():
    g = Generator(CFG)
    z = jnp.zeros((1, 16, 32))
    return g.init(jax.random.PRNGKey(0), z, z)


def brightness_scorer(img):
    """A deterministic stand-in attribute: mean brightness."""
    return jnp.mean(img, axis=(1, 2, 3))


def test_full_noinversion_pipeline(gen_params, tmp_path):
    z_flat, p_flat, scores = collect_scored_latents(
        CFG, gen_params, brightness_scorer, n_samples=256, batch=64)
    assert z_flat.shape == (256, 16 * 32)
    assert np.isfinite(scores).all()

    boundaries = train_dual_boundaries(z_flat, p_flat, scores,
                                       chosen_ratio=0.1)
    assert boundaries["z"].shape == (1, 16 * 32)

    run_noinversion_sweep(CFG, gen_params, brightness_scorer, boundaries,
                          str(tmp_path), "bright", 2.0, 2.0,
                          n_edit_samples=2, steps=5)
    for space in ("pz_plus", "p_plus", "z_plus"):
        frames = os.listdir(tmp_path / space)
        assert any(f.startswith("origin_0_edit_") for f in frames)
        assert any(f.startswith("strip_") for f in frames)

    # edited-attribute scores should trend with the boundary direction
    decode = make_strip_decoder(CFG, gen_params, brightness_scorer)
    zp = z_flat[0].reshape(16, 32)
    pp = p_flat[0].reshape(16, 32)
    strips = edit_sample(decode, zp, pp, boundaries, 4.0, 4.0, steps=7)
    traj = strips["pz_plus"].scores
    assert traj[-1] != traj[0]


def test_streamed_memmap_store(gen_params):
    """VERDICT #6: the 150k-sample protocol must not OOM the host.
    Forced-memmap collection matches the RAM path bit-for-bit, and the
    protocol-scale store (150k x 8192) allocates on disk, not RAM."""
    from transeditor_tpu.edit.sweep import _latent_store

    kw = dict(n_samples=128, batch=64, seed=3)
    z_ram, p_ram, s_ram = collect_scored_latents(
        CFG, gen_params, brightness_scorer, store="ram", **kw)
    z_mm, p_mm, s_mm = collect_scored_latents(
        CFG, gen_params, brightness_scorer, store="memmap", **kw)
    assert isinstance(z_mm, np.memmap)
    np.testing.assert_array_equal(np.asarray(z_mm), z_ram)
    np.testing.assert_array_equal(np.asarray(p_mm), p_ram)
    np.testing.assert_array_equal(s_mm, s_ram)

    # 'auto' spills to disk at protocol scale (150k x 16*512 f32 ~ 4.9GB
    # per tree vs the default 1 GB budget) without touching host RAM
    big = _latent_store(150_000, 16 * 512, "auto", (1 << 30) // 2, None)
    assert isinstance(big, np.memmap)
    big[149_999, -1] = 1.0  # last element addressable
    assert big[149_999, -1] == 1.0
    del big

    # ...and stays in RAM when it fits the budget
    small = _latent_store(64, 512, "auto", 1 << 30, None)
    assert not isinstance(small, np.memmap)


def test_sweep_presets_match_reference_tables():
    """Built-in presets reproduce the reference's config_* JSON files
    (our_interfaceGAN/config_noinversion/pose.json etc.) including the
    name-vs-index resolution of edit_all_noinversion_celebahq.py:128-141
    and the separate seed grid (:232-236)."""
    from transeditor_tpu.edit.presets import sweep_preset

    assert sweep_preset("pose") == {"style_end_distance": [1],
                                    "content_end_distance": [17]}
    assert sweep_preset("pose", inversion=True) == {
        "style_end_distance": [1], "content_end_distance": [20]}
    assert sweep_preset("age") == {"style_end_distance": [2.5],
                                   "content_end_distance": [1]}
    # CelebA-HQ attributes resolve by index (Male == 0)
    assert sweep_preset("Male", attribute_index=0) == {
        "style_end_distance": [5], "content_end_distance": [3]}
    assert sweep_preset("Wavy_Hair", attribute_index=3,
                        inversion=True) == {
        "style_end_distance": [10], "content_end_distance": [15]}
    # unknown attribute -> None (caller falls back to explicit flags)
    assert sweep_preset("nonexistent") is None
    # seed grid merges like the reference's two-file combination
    c = sweep_preset("gender", with_seeds=True)
    assert c["seed"] == [0, 100]
