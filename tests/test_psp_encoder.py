"""pSp encoder / coach smoke tests (IR-SE-50 trunk is heavy: marked slow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transeditor_tpu.config import ModelConfig
from transeditor_tpu.models.irse import ArcFaceBackbone, IRSEBackbone, unit_list
from transeditor_tpu.models.psp import (GradualStyleEncoder, PSPModel,
                                        bilinear_align_corners)
from transeditor_tpu.train.coach import CoachConfig, make_coach
from transeditor_tpu.train.ranger import centralize_gradients, ranger_simple
from transeditor_tpu.zoo.lpips import LPIPS

torch = pytest.importorskip("torch")


def test_unit_list_counts():
    units = unit_list(50)
    assert len(units) == 3 + 4 + 14 + 3 == 24
    # pSp taps: 6 ends the 128-ch stage slice, 20 the 256-ch stage
    # (matching latlayer2: 128->512 and latlayer1: 256->512)
    assert units[6][1] == 128 and units[20][1] == 256
    assert units[23][1] == 512


def test_bilinear_align_corners_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    got = np.asarray(bilinear_align_corners(jnp.asarray(x), 9, 13))
    want = torch.nn.functional.interpolate(
        torch.tensor(x.transpose(0, 3, 1, 2)), size=(9, 13),
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_centralize_gradients():
    gc = centralize_gradients()
    g = {"w": jnp.ones((3, 4)) * jnp.arange(4), "b": jnp.ones((4,))}
    out, _ = gc.update(g, gc.init(g))
    # each column is constant -> centralizing over non-output axes zeros it
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0, atol=1e-6)
    # rank-1 params untouched
    np.testing.assert_allclose(np.asarray(out["b"]), 1.0)


def test_ranger_step_moves_params():
    opt = ranger_simple(1e-3)
    p = {"w": jnp.ones((4, 4))}
    s = opt.init(p)
    import optax
    # non-constant gradient (GC zeroes a constant one by design)
    g = {"w": jnp.arange(16.0).reshape(4, 4)}
    upd, s = opt.update(g, s, p)
    p2 = optax.apply_updates(p, upd)
    assert float(jnp.sum(jnp.abs(p2["w"] - p["w"]))) > 0


@pytest.mark.slow
def test_gradual_style_encoder_shapes():
    enc = GradualStyleEncoder()
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    z, p = enc.apply(variables, x)
    assert z.shape == (1, 16, 512)
    assert p.shape == (1, 16, 512)
    assert "batch_stats" in variables


@pytest.mark.slow
def test_coach_train_step():
    cfg = ModelConfig(size=64, max_channels=32, n_trans=1)
    psp = PSPModel.create(cfg)
    dec_params = psp.decoder.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 512)), jnp.zeros((1, 16, 512)))

    lpips = LPIPS(net="alex")
    x0 = jnp.zeros((1, 64, 64, 3))
    lpips_params = lpips.init(jax.random.PRNGKey(1), x0, x0)

    ccfg = CoachConfig(batch_size=2, id_lambda=0.0, lpips_lambda=0.8,
                       l2_lambda=1.0, use_fake_lambda=0.5)
    init_fn, train_step, eval_step, fake_step = make_coach(
        cfg, ccfg, dec_params, lpips_params)
    state = init_fn(jax.random.PRNGKey(2))

    real = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3),
                              minval=-1, maxval=1)
    state2, logs, inv = train_step(state, real)
    assert np.isfinite(float(logs["loss"]))
    assert inv.shape == (2, 64, 64, 3)
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))),
                     state.enc_params, state2.enc_params))
    assert moved > 0

    state3, fake_loss = fake_step(state2, jax.random.PRNGKey(4))
    assert np.isfinite(float(fake_loss))

    logs, _ = eval_step(state3, real)
    assert np.isfinite(float(logs["loss"]))


@pytest.mark.slow
def test_coach_sharded_step_8dev():
    """Coach train step with the batch sharded over an 8-device data
    mesh — the DDP analogue for encoder training.  Under GSPMD the
    encoder's BatchNorm reductions are automatically GLOBAL over the
    sharded batch axis (torch DDP would need SyncBN for this), so the
    sharded step is numerically the single-device step."""
    from transeditor_tpu.parallel import create_mesh, shard_batch

    assert len(jax.devices()) == 8
    cfg = ModelConfig(size=64, max_channels=32, n_trans=1)
    psp = PSPModel.create(cfg)
    dec_params = psp.decoder.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 512)), jnp.zeros((1, 16, 512)))
    lpips = LPIPS(net="alex")
    x0 = jnp.zeros((1, 64, 64, 3))
    lpips_params = lpips.init(jax.random.PRNGKey(1), x0, x0)

    ccfg = CoachConfig(batch_size=8, id_lambda=0.0, lpips_lambda=0.8,
                      l2_lambda=1.0)
    init_fn, train_step, eval_step, _ = make_coach(
        cfg, ccfg, dec_params, lpips_params)
    state = init_fn(jax.random.PRNGKey(2))

    real = jax.random.uniform(jax.random.PRNGKey(3), (8, 64, 64, 3),
                              minval=-1, maxval=1)
    ref_state, ref_logs, _ = train_step(state, real)

    mesh = create_mesh(n_data=8, n_model=1)
    sharded_state, logs, inv = train_step(state, shard_batch(real, mesh))
    assert inv.shape == (8, 64, 64, 3)
    np.testing.assert_allclose(float(logs["loss"]),
                               float(ref_logs["loss"]), rtol=2e-3)
    # BN batch stats equal the single-device (global-batch) stats
    ref_leaf = jax.tree.leaves(ref_state.enc_stats)[0]
    got_leaf = jax.tree.leaves(sharded_state.enc_stats)[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(ref_leaf),
                               rtol=2e-3, atol=2e-5)
