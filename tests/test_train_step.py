"""Train-step smoke tests: losses move, regs compile (2nd order), EMA
updates, and the whole step runs sharded on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.parallel import create_mesh, shard_batch, shard_params
from transeditor_tpu.train.gan import init_state, make_train_step

CFG = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)
TCFG = TrainConfig(batch_size=4, r1_gamma=10.0)


@pytest.fixture(scope="module")
def setup():
    state = init_state(CFG, TCFG, jax.random.PRNGKey(0))
    step = make_train_step(CFG, TCFG)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    return state, step, real


def test_plain_step(setup):
    state, step, real = setup
    new_state, m = step(state, real, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    for k in ("d", "g", "real_score", "fake_score"):
        assert np.isfinite(float(m[k])), k
    # params actually moved
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))),
                     state.params_g, new_state.params_g))
    assert diff > 0


def test_reg_step(setup):
    state, step, real = setup
    new_state, m = step(state, real, jax.random.PRNGKey(3),
                        do_d_reg=True, do_g_reg=True)
    assert np.isfinite(float(m["r1"]))
    assert np.isfinite(float(m["path"]))
    assert np.isfinite(float(m["path_length"]))
    assert float(new_state.mean_path_length) != 0.0


def test_spatial_reg_step(setup):
    state, step, real = setup
    _, m = step(state, real, jax.random.PRNGKey(4), do_spatial_reg=True)
    assert np.isfinite(float(m["spatial_path"]))


def test_ema_moves_towards_params(setup):
    state, step, real = setup
    s1, _ = step(state, real, jax.random.PRNGKey(5))
    # after one step ema != params (decay<1) but changed from init copy
    changed = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                           s1.g_ema, state.g_ema)
    assert jax.tree.reduce(max, changed) > 0


def test_sharded_step_8dev():
    """Full train step on a (4 data, 2 model) mesh — the multi-chip
    path the driver dry-runs."""
    assert len(jax.devices()) == 8
    mesh = create_mesh(n_data=4, n_model=2)
    state = init_state(CFG, TCFG, jax.random.PRNGKey(0))
    state = state.replace(
        params_g=shard_params(state.params_g, mesh, min_size=32),
        params_d=shard_params(state.params_d, mesh, min_size=32))
    step = make_train_step(CFG, TCFG)
    real = shard_batch(
        jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3)), mesh)
    new_state, m = step(state, real, jax.random.PRNGKey(2),
                        do_d_reg=True, do_g_reg=True)
    assert np.isfinite(float(m["d"]))
    assert np.isfinite(float(m["r1"]))


def test_fsdp_sharded_step_8dev():
    """ZeRO/FSDP mode: params + Adam moments sharded over 'data'
    (reduce-scatter grads, all-gather at use — all GSPMD-inserted).
    Must produce the same training math as the replicated-params run."""
    assert len(jax.devices()) == 8
    mesh = create_mesh(n_data=4, n_model=2)
    state = init_state(CFG, TCFG, jax.random.PRNGKey(0))
    real = shard_batch(
        jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3)), mesh)
    step = make_train_step(CFG, TCFG)
    _, ref_m = step(state, real, jax.random.PRNGKey(2),
                    do_d_reg=True, do_g_reg=True)

    kw = dict(min_size=32, fsdp=True)
    fstate = state.replace(
        params_g=shard_params(state.params_g, mesh, **kw),
        params_d=shard_params(state.params_d, mesh, **kw),
        g_ema=shard_params(state.g_ema, mesh, **kw),
        opt_g=shard_params(state.opt_g, mesh, **kw),
        opt_d=shard_params(state.opt_d, mesh, **kw))
    # the big leaves must actually be data-sharded (params AND moments)
    for tree in (fstate.params_g, fstate.opt_g):
        assert any(
            "data" in [ax for ax in leaf.sharding.spec if ax is not None]
            for leaf in jax.tree.leaves(tree)
            if hasattr(leaf, "sharding") and leaf.ndim >= 2), tree
    new_state, m = step(fstate, real, jax.random.PRNGKey(2),
                        do_d_reg=True, do_g_reg=True)
    assert int(new_state.step) == 1
    for k in ref_m:
        np.testing.assert_allclose(float(m[k]), float(ref_m[k]),
                                   rtol=5e-3, atol=5e-3, err_msg=k)


def test_donated_step_matches_plain():
    """`donate=True` is a pure buffer-aliasing hint — the donated step
    must produce bit-identical results to the plain step.

    NOTE: XLA:CPU ignores donation, so this only pins the API contract;
    actual HBM aliasing was validated on the real v5e (donated steps
    ran chained in the train-perf probe with matching losses — README
    journal, donation A/B)."""
    state_a = init_state(CFG, TCFG, jax.random.PRNGKey(0))
    state_b = init_state(CFG, TCFG, jax.random.PRNGKey(0))
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    key = jax.random.PRNGKey(7)
    plain = make_train_step(CFG, TCFG)
    donated = make_train_step(CFG, TCFG, donate=True)
    sa, ma = plain(state_a, real, key, do_d_reg=True, do_g_reg=True)
    sb, mb = donated(state_b, real, key, do_d_reg=True, do_g_reg=True)
    for k in ma:
        assert float(ma[k]) == float(mb[k]), k
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), sa.params_g, sb.params_g)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), sa.params_d, sb.params_d)


def test_grad_accum_matches_manual_schedule():
    """grad_accum=2 must equal the hand-computed mean of per-microbatch
    gradients applied once — pins the key-split order (k_d/k_g then a
    K-way split), the [K, B/K] reshape, and mean-of-grads exactness."""
    import optax

    from transeditor_tpu.models import Discriminator, Generator
    from transeditor_tpu.train import losses
    from transeditor_tpu.train.gan import make_optimizers
    from transeditor_tpu.utils.sampling import sample_zp

    tcfg = TrainConfig(batch_size=4, grad_accum=2)
    state = init_state(CFG, tcfg, jax.random.PRNGKey(0))
    step = make_train_step(CFG, tcfg)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    rng = jax.random.PRNGKey(9)
    new_state, m = step(state, real, rng)

    gen, disc = Generator(CFG), Discriminator(CFG)
    g_opt, d_opt = make_optimizers(tcfg)
    f32 = jnp.float32

    def d_loss(params_d, params_g, r, key):
        kz, _ = jax.random.split(key)
        z, p = sample_zp(kz, r.shape[0], CFG.n_tokens, CFG.style_dim)
        fake = gen.apply({"params": params_g}, z, p).image
        fake_pred = disc.apply({"params": params_d},
                               jax.lax.stop_gradient(fake))
        real_pred = disc.apply({"params": params_d}, r)
        return losses.d_logistic_loss(real_pred.astype(f32),
                                      fake_pred.astype(f32))

    def g_loss(params_g, params_d, batch, key):
        kz, _ = jax.random.split(key)
        z, p = sample_zp(kz, batch, CFG.n_tokens, CFG.style_dim)
        fake = gen.apply({"params": params_g}, z, p).image
        return losses.g_nonsaturating_loss(
            disc.apply({"params": params_d}, fake).astype(f32))

    k_d, k_g = jax.random.split(rng, 6)[:2]
    micro = real.reshape(2, 2, 16, 16, 3)

    kds = jax.random.split(k_d, 2)
    d_grads = [jax.grad(d_loss)(state.params_d, state.params_g,
                                micro[i], kds[i]) for i in range(2)]
    mean_d = jax.tree.map(lambda a, b: (a + b) / 2, *d_grads)
    upd, _ = d_opt.update(mean_d, state.opt_d, state.params_d)
    want_pd = optax.apply_updates(state.params_d, upd)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        new_state.params_d, want_pd)

    kgs = jax.random.split(k_g, 2)
    g_grads = [jax.grad(g_loss)(state.params_g, want_pd, 2, kgs[i])
               for i in range(2)]
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2, *g_grads)
    upd, _ = g_opt.update(mean_g, state.opt_g, state.params_g)
    want_pg = optax.apply_updates(state.params_g, upd)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        new_state.params_g, want_pg)


def test_grad_accum_reg_step_and_validation():
    """Both 2nd-order regularizers run under accumulation (R1 is
    microbatched, path reg stays single-shot); indivisible batches are
    rejected at trace time."""
    tcfg = TrainConfig(batch_size=4, grad_accum=2)
    state = init_state(CFG, tcfg, jax.random.PRNGKey(0))
    step = make_train_step(CFG, tcfg)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    new_state, m = step(state, real, jax.random.PRNGKey(3),
                        do_d_reg=True, do_g_reg=True)
    for k in ("d", "g", "r1", "path"):
        assert np.isfinite(float(m[k])), k
    assert int(new_state.step) == 1

    bad = make_train_step(CFG, TrainConfig(batch_size=4, grad_accum=3))
    with pytest.raises(ValueError, match="grad_accum"):
        bad(state, real, jax.random.PRNGKey(4))


def test_noise_injection_train_step():
    """Full step with layer noise injection ON (--inject_noise,
    reference train_spatial_query.py:402): both 2nd-order regs must
    differentiate through the per-layer noise rngs."""
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32,
                      max_channels=32, n_trans=1,
                      layer_noise_injection=True)
    state = init_state(cfg, TCFG, jax.random.PRNGKey(0))
    step = make_train_step(cfg, TCFG)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    new_state, m = step(state, real, jax.random.PRNGKey(2),
                        do_d_reg=True, do_g_reg=True)
    for k in ("d", "g", "r1", "path"):
        assert np.isfinite(float(m[k])), k
    assert int(new_state.step) == 1
