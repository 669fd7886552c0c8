"""Full-dress checkpoint-port rehearsal at the FLAGSHIP config.

All other oracle tests run at size 32/64 with n_trans<=2; nothing there
proves the exact shape of the published ``790000.pt`` — 256px, 8
attention blocks, channel_multiplier=2 (the cm=2 columns at 64/128/256
in the channels dict, model_spatial_query.py:473-483), 16 per-token
mapping layers, 13 synthesis convs + 7 ToRGBs.  The real blobs are in
``.MISSING_LARGE_BLOBS``, so this fabricates a bundle EXACTLY like the
reference's trainer saves it (``train_spatial_query.py:361-371``:
``{g, d, g_ema, g_optim, d_optim}`` with reg-ratio Adam param groups),
writes it with torch.save, loads it back through our zipfile+pickle
reader and port layer UNMODIFIED, and pixel-compares the g_ema forward
against the torch-CPU reference.

This is the strongest attainable proof that the north-star port
("pixel match / FID within 1%" on the published checkpoints) will work
end to end.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oracle_utils import load_reference_module  # noqa: E402
from transeditor_tpu.config import ModelConfig  # noqa: E402
from transeditor_tpu.io.checkpoint import (  # noqa: E402
    load_reference_discriminator, load_reference_generator)
from transeditor_tpu.models import Discriminator, Generator  # noqa: E402

CFG = ModelConfig()  # the flagship: 256px, cm=2, n_trans=8, 16 tokens
assert CFG.size == 256 and CFG.channel_multiplier == 2 \
    and CFG.n_trans == 8 and CFG.token_dim == 14


@pytest.fixture(scope="module")
def flagship(tmp_path_factory):
    """(bundle_path, ref_g_ema, ref_d) — fabricated like the reference
    trainer's 10k-iter save (train_spatial_query.py:361-371,461-473)."""
    ref_mod = load_reference_module()

    def make_g(seed):
        torch.manual_seed(seed)
        g = ref_mod.Generator(
            CFG.size, CFG.style_dim, CFG.param_dim, CFG.token_dim,
            channel_multiplier=CFG.channel_multiplier,
            layer_noise_injection=False, use_spatial_mapping=True,
            num_region=1, n_trans=CFG.n_trans, pixel_norm_op_dim=1,
            no_trans=False)
        g.eval()
        return g

    g = make_g(0)
    g_ema = make_g(1)  # distinct weights so key mix-ups can't pass
    torch.manual_seed(2)
    d = ref_mod.Discriminator(
        CFG.size, channel_multiplier=CFG.channel_multiplier)
    d.eval()

    # reg-ratio Adam exactly as the trainer builds it (:461-473), with
    # state entries populated (a real 790000.pt has exp_avg/exp_avg_sq
    # for every param; a zero-grad step creates the same structure)
    g_ratio = 4 / 5.0   # g_reg_every / (g_reg_every + 1)
    d_ratio = 16 / 17.0
    g_optim = torch.optim.Adam(g.parameters(), lr=0.002 * g_ratio,
                               betas=(0 ** g_ratio, 0.99 ** g_ratio))
    d_optim = torch.optim.Adam(d.parameters(), lr=0.002 * d_ratio,
                               betas=(0 ** d_ratio, 0.99 ** d_ratio))
    for opt, net in ((g_optim, g), (d_optim, d)):
        for p in net.parameters():
            p.grad = torch.zeros_like(p)
        opt.step()
        opt.zero_grad(set_to_none=True)

    path = str(tmp_path_factory.mktemp("flagship") / "010000.pt")
    torch.save({"g": g.state_dict(), "d": d.state_dict(),
                "g_ema": g_ema.state_dict(),
                "g_optim": g_optim.state_dict(),
                "d_optim": d_optim.state_dict()}, path)
    return path, g_ema, d


def _codes(seed, b=2):
    rng = np.random.RandomState(seed)
    z = rng.randn(b, CFG.style_dim, CFG.n_tokens).astype(np.float32)
    p = rng.randn(b, CFG.param_dim, CFG.n_tokens).astype(np.float32)
    return z, p


@pytest.mark.slow
def test_flagship_gema_pixel_parity(flagship):
    """g_ema ported from the full bundle reproduces the reference
    forward at 256px (fixed Z,P) — the north-star gate."""
    path, g_ema, _ = flagship
    params = load_reference_generator(path, CFG)  # key='g_ema'
    gen = Generator(CFG)

    z, p = _codes(7)
    with torch.no_grad():
        want, ref_lat, _ = g_ema(torch.tensor(z), torch.tensor(p),
                                 return_latents=True)
    out = gen.apply(params, jnp.asarray(z.transpose(0, 2, 1)),
                    jnp.asarray(p.transpose(0, 2, 1)))
    got = np.asarray(out.image).transpose(0, 3, 1, 2)
    assert got.shape == (2, 3, 256, 256)
    # 13 modconv layers deep at f32: slightly looser than the size-32
    # oracle (2e-4) but orders of magnitude below any real port bug
    np.testing.assert_allclose(got, want.numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.latent), ref_lat.numpy(),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_flagship_discriminator_parity(flagship):
    path, _, d = flagship
    params = load_reference_discriminator(path, CFG)
    rng = np.random.RandomState(11)
    img = rng.randn(4, 3, 256, 256).astype(np.float32) * 0.5
    with torch.no_grad():
        want = d(torch.tensor(img)).numpy()
    got = np.asarray(Discriminator(CFG).apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_flagship_bundle_key_coverage(flagship):
    """Every g_ema tensor in the bundle is consumed by the port and
    round-trips through our exporter with identical names/shapes — the
    16-mapping/8-block/cm=2 naming never goes through a silent-skip."""
    from transeditor_tpu.io.torch_export import generator_state_dict

    path, g_ema, _ = flagship
    params = load_reference_generator(path, CFG)
    back = generator_state_dict(params, CFG)
    want = {k: tuple(v.shape) for k, v in g_ema.state_dict().items()}
    got = {k: tuple(np.shape(v)) for k, v in back.items()}
    assert got == want
