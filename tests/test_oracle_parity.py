"""End-to-end numerical parity: reference torch model (CPU oracle) vs
our JAX model with ported weights.

This is the gating test for the checkpoint-port milestone: a randomly
initialised reference Generator/Discriminator state_dict is ported via
``transeditor_tpu.io.torch_port`` and must reproduce the reference's
outputs for fixed inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oracle_utils import load_reference_module  # noqa: E402
from transeditor_tpu.config import ModelConfig  # noqa: E402
from transeditor_tpu.io import (  # noqa: E402
    discriminator_params_from_torch,
    generator_params_from_torch,
)
from transeditor_tpu.models import Discriminator, Generator  # noqa: E402

SIZE = 32
CFG = ModelConfig(size=SIZE, n_trans=2, pixel_norm_axis="feature")


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module()


@pytest.fixture(scope="module")
def ref_gen(ref_mod):
    torch.manual_seed(0)
    g = ref_mod.Generator(
        SIZE, CFG.style_dim, CFG.param_dim, CFG.token_dim,
        channel_multiplier=CFG.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=1, n_trans=CFG.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    g.eval()
    return g


@pytest.fixture(scope="module")
def ported_gen(ref_gen):
    sd = {k: v.detach().numpy() for k, v in ref_gen.state_dict().items()}
    params = generator_params_from_torch(sd, CFG)
    return Generator(CFG), params


def _codes(seed, b=2):
    rng = np.random.RandomState(seed)
    z = rng.randn(b, CFG.style_dim, 16).astype(np.float32)
    p = rng.randn(b, CFG.param_dim, 16).astype(np.float32)
    return z, p


def test_generator_image_parity(ref_gen, ported_gen):
    z, p = _codes(7)
    with torch.no_grad():
        ref_img, ref_lat, _ = ref_gen(torch.tensor(z), torch.tensor(p),
                                      return_latents=True)
    g, params = ported_gen
    out = g.apply(params, jnp.asarray(z.transpose(0, 2, 1)),
                  jnp.asarray(p.transpose(0, 2, 1)))
    got_img = np.asarray(out.image).transpose(0, 3, 1, 2)
    want_img = ref_img.numpy()
    np.testing.assert_allclose(got_img, want_img, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.latent), ref_lat.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_mapped_codes_parity(ref_gen, ported_gen):
    z, p = _codes(11)
    with torch.no_grad():
        ref_zp, ref_pp = ref_gen(torch.tensor(z), torch.tensor(p),
                                 return_mapped_codes=True)
    g, params = ported_gen
    zp, pp = g.apply(params, jnp.asarray(z.transpose(0, 2, 1)),
                     jnp.asarray(p.transpose(0, 2, 1)), method="map_codes")
    np.testing.assert_allclose(
        np.asarray(zp), ref_zp.numpy().transpose(0, 2, 1),
        atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pp), ref_pp.numpy().transpose(0, 2, 1),
        atol=1e-5, rtol=1e-4)


def test_plus_space_decode_parity(ref_gen, ported_gen):
    """use_*_mapping=False decode — the projector/editor seam
    (projector_optimization.py:203-205)."""
    z, p = _codes(13)
    with torch.no_grad():
        zp, pp = ref_gen(torch.tensor(z), torch.tensor(p),
                         return_mapped_codes=True)
        ref_img, _, _ = ref_gen(zp, pp, use_spatial_mapping=False,
                                use_style_mapping=False)
    g, params = ported_gen
    out = g.apply(params, jnp.asarray(zp.numpy().transpose(0, 2, 1)),
                  jnp.asarray(pp.numpy().transpose(0, 2, 1)),
                  map_z=False, map_p=False)
    np.testing.assert_allclose(
        np.asarray(out.image).transpose(0, 3, 1, 2), ref_img.numpy(),
        atol=2e-4, rtol=1e-3)


def test_input_is_latent_parity(ref_gen, ported_gen):
    z, p = _codes(17)
    with torch.no_grad():
        _, ref_lat, _ = ref_gen(torch.tensor(z), torch.tensor(p),
                                return_latents=True)
        ref_img, _, _ = ref_gen(ref_lat, torch.tensor(p),
                                input_is_latent=True)
    g, params = ported_gen
    out = g.apply(params, jnp.asarray(ref_lat.numpy()),
                  jnp.asarray(p.transpose(0, 2, 1)), input_is_latent=True)
    np.testing.assert_allclose(
        np.asarray(out.image).transpose(0, 3, 1, 2), ref_img.numpy(),
        atol=2e-4, rtol=1e-3)


def test_num_region_mapping_parity(ref_mod):
    """num_region=2 ⇒ only 16/2=8 mapping layers exist and the
    reference maps just tokens 0..7, leaving the tail of the zeros
    buffer untouched (model_spatial_query.py:462,626-646).  Our
    TokenMapping must reproduce the zero tail and the porter must
    stack the reduced layer count."""
    cfg2 = ModelConfig(size=SIZE, n_trans=2, num_region=2,
                       pixel_norm_axis="feature")
    torch.manual_seed(2)
    ref_g = ref_mod.Generator(
        SIZE, cfg2.style_dim, cfg2.param_dim, cfg2.token_dim,
        channel_multiplier=cfg2.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=2, n_trans=cfg2.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    ref_g.eval()

    z, p = _codes(23)
    with torch.no_grad():
        ref_zp, ref_pp = ref_g(torch.tensor(z), torch.tensor(p),
                               return_mapped_codes=True)
        ref_img, _, _ = ref_g(torch.tensor(z), torch.tensor(p))

    sd = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}
    params = generator_params_from_torch(sd, cfg2)
    g = Generator(cfg2)
    zp, pp = g.apply(params, jnp.asarray(z.transpose(0, 2, 1)),
                     jnp.asarray(p.transpose(0, 2, 1)), method="map_codes")
    # tail tokens are exactly zero in both implementations
    assert np.all(np.asarray(zp)[:, cfg2.num_mappings:] == 0.0)
    assert np.all(ref_zp.numpy()[:, :, cfg2.num_mappings:] == 0.0)
    np.testing.assert_allclose(
        np.asarray(zp), ref_zp.numpy().transpose(0, 2, 1),
        atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(pp), ref_pp.numpy().transpose(0, 2, 1),
        atol=1e-5, rtol=1e-4)
    out = g.apply(params, jnp.asarray(z.transpose(0, 2, 1)),
                  jnp.asarray(p.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(out.image).transpose(0, 3, 1, 2), ref_img.numpy(),
        atol=2e-4, rtol=1e-3)


def test_discriminator_parity(ref_mod):
    torch.manual_seed(1)
    ref_d = ref_mod.Discriminator(SIZE, channel_multiplier=2)
    ref_d.eval()
    rng = np.random.RandomState(3)
    img = rng.randn(4, 3, SIZE, SIZE).astype(np.float32)
    with torch.no_grad():
        want = ref_d(torch.tensor(img)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref_d.state_dict().items()}
    params = discriminator_params_from_torch(sd, CFG)
    d = Discriminator(CFG)
    got = np.asarray(d.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_spatial_path_lengths_oracle(ref_gen, ported_gen):
    """Spatial path-reg path_lengths parity: the reference reuses
    g_path_regularize (train_spatial_query.py:92-105) on its
    [B, 512, 16] P layout — .sum(2).mean(1) there is sum-over-TOKENS,
    mean-over-FEATURES. Regression for the transposed reduction (a
    constant sqrt(D/T) scale error in our [B, T, D] layout)."""
    import torch.autograd as autograd

    z, p = _codes(17)
    z_t = torch.tensor(z)
    p_t = torch.tensor(p, requires_grad=True)
    fake, _, _ = ref_gen(z_t, p_t)
    rng = np.random.RandomState(5)
    noise_nchw = (rng.randn(*fake.shape).astype(np.float32)
                  / np.sqrt(fake.shape[2] * fake.shape[3]))
    (grad_t,) = autograd.grad((fake * torch.tensor(noise_nchw)).sum(),
                              p_t)
    want = torch.sqrt(grad_t.pow(2).sum(2).mean(1)).detach().numpy()

    g, params = ported_gen

    def proj(p_in):
        img = g.apply(params, jnp.asarray(z.transpose(0, 2, 1)), p_in)
        return jnp.sum(img.image
                       * jnp.asarray(noise_nchw.transpose(0, 2, 3, 1)))

    grad_j = jax.grad(proj)(jnp.asarray(p.transpose(0, 2, 1)))
    # our [B, T, D] layout: sum over tokens (axis=1), mean over features
    got = np.asarray(jnp.sqrt(jnp.mean(jnp.sum(grad_j ** 2, axis=1),
                                       axis=-1)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=2e-3)


def test_path_lengths_oracle(ref_gen, ported_gen):
    """Standard path-reg path_lengths parity (g_path_regularize on the
    [B, n_latent, 512] style latents — layouts agree, proven here)."""
    import torch.autograd as autograd

    z, p = _codes(19)
    fake, lat, _ = ref_gen(torch.tensor(z), torch.tensor(p),
                           return_latents=True)
    rng = np.random.RandomState(6)
    noise_nchw = (rng.randn(*fake.shape).astype(np.float32)
                  / np.sqrt(fake.shape[2] * fake.shape[3]))
    (grad_t,) = autograd.grad((fake * torch.tensor(noise_nchw)).sum(),
                              lat)
    want = torch.sqrt(grad_t.pow(2).sum(2).mean(1)).detach().numpy()

    g, params = ported_gen
    z_j = jnp.asarray(z.transpose(0, 2, 1))
    p_j = jnp.asarray(p.transpose(0, 2, 1))
    zp, pp = g.apply(params, z_j, p_j, method="map_codes")
    tokens = g.apply(params, zp, pp, method="interact_codes")
    latent = g.apply(params, tokens, method="style_latents_from")
    noise_nhwc = jnp.asarray(noise_nchw.transpose(0, 2, 3, 1))

    def proj(lat_in):
        img = g.apply(params, pp, lat_in, method="synthesize")
        return jnp.sum(img * noise_nhwc)

    grad_j = jax.grad(proj)(latent)
    got = np.asarray(jnp.sqrt(jnp.mean(jnp.sum(grad_j ** 2, axis=2),
                                       axis=1)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=2e-3)


def test_generator_image_parity_size64(ref_mod):
    """Same oracle at a SECOND size: the derived constants
    (token_dim=2*(log2-1), n_latent, channel map) all change between
    32 and 64, so a formula bug at one size can't hide."""
    cfg = ModelConfig(size=64, n_trans=1, pixel_norm_axis="feature")
    assert cfg.token_dim == 10 and cfg.n_latent == 10
    torch.manual_seed(4)
    g_ref = ref_mod.Generator(
        64, cfg.style_dim, cfg.param_dim, cfg.token_dim,
        channel_multiplier=cfg.channel_multiplier,
        layer_noise_injection=False, use_spatial_mapping=True,
        num_region=1, n_trans=cfg.n_trans, pixel_norm_op_dim=1,
        no_trans=False)
    g_ref.eval()
    sd = {k: v.detach().numpy() for k, v in g_ref.state_dict().items()}
    params = generator_params_from_torch(sd, cfg)

    rng = np.random.RandomState(21)
    z = rng.randn(2, cfg.style_dim, 16).astype(np.float32)
    p = rng.randn(2, cfg.param_dim, 16).astype(np.float32)
    with torch.no_grad():
        want, _, _ = g_ref(torch.tensor(z), torch.tensor(p))
    out = Generator(cfg).apply(params,
                               jnp.asarray(z.transpose(0, 2, 1)),
                               jnp.asarray(p.transpose(0, 2, 1)))
    got = np.asarray(out.image).transpose(0, 3, 1, 2)
    assert got.shape == (2, 3, 64, 64)
    np.testing.assert_allclose(got, want.numpy(), atol=3e-4, rtol=1e-3)
