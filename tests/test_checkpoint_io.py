"""Checkpoint IO: torch-free zip reader vs torch.save, orbax roundtrip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.io.checkpoint import (restore_train_state,
                                           save_train_state)
from transeditor_tpu.io.torch_port import _load_zip_pickle
from transeditor_tpu.train.gan import init_state

torch = pytest.importorskip("torch")


def test_zip_pickle_reader_matches_torch(tmp_path):
    torch.manual_seed(0)
    obj = {
        "g": {"layer.weight": torch.randn(4, 3),
              "layer.bias": torch.zeros(4)},
        "scalar": torch.tensor(3.5),
        "ints": torch.arange(10, dtype=torch.int64),
        "nested": [torch.ones(2, 2, 2)],
    }
    p = str(tmp_path / "ckpt.pt")
    torch.save(obj, p)

    got = _load_zip_pickle(p)
    np.testing.assert_allclose(got["g"]["layer.weight"],
                               obj["g"]["layer.weight"].numpy())
    np.testing.assert_allclose(got["g"]["layer.bias"], np.zeros(4))
    assert float(np.asarray(got["scalar"])) == 3.5
    np.testing.assert_array_equal(np.asarray(got["ints"]), np.arange(10))
    np.testing.assert_allclose(got["nested"][0],
                               np.ones((2, 2, 2)))


def test_orbax_train_state_roundtrip(tmp_path):
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                      n_trans=1)
    tcfg = TrainConfig(batch_size=2)
    state = init_state(cfg, tcfg, jax.random.PRNGKey(0))
    save_train_state(str(tmp_path), 7, state)

    template = init_state(cfg, tcfg, jax.random.PRNGKey(1))
    restored, step = restore_train_state(str(tmp_path), template)
    assert step == 7
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(restored.params_g)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    oa = jax.tree.leaves(state.opt_g)
    ob = jax.tree.leaves(restored.opt_g)
    assert len(oa) == len(ob)


def test_save_overwrites_existing_step(tmp_path):
    """Re-saving a step must overwrite (torch.save semantics) — a
    resumed run that re-hits a cadence step previously crashed with
    orbax 'Destination already exists'."""
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                      n_trans=1)
    tcfg = TrainConfig(batch_size=2)
    s1 = init_state(cfg, tcfg, jax.random.PRNGKey(0))
    s2 = init_state(cfg, tcfg, jax.random.PRNGKey(5))
    save_train_state(str(tmp_path), 3, s1)
    save_train_state(str(tmp_path), 3, s2)          # sync overwrite
    restored, step = restore_train_state(str(tmp_path), s1)
    assert step == 3
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params_g)[0]),
        np.asarray(jax.tree.leaves(s2.params_g)[0]))
    # async path too
    from transeditor_tpu.io.checkpoint import wait_for_saves
    save_train_state(str(tmp_path), 3, s1, async_save=True)
    wait_for_saves()
    restored2, _ = restore_train_state(str(tmp_path), s1)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored2.params_g)[0]),
        np.asarray(jax.tree.leaves(s1.params_g)[0]))


def test_async_save_restore_roundtrip(tmp_path):
    """async_save=True serialises in the background; wait_for_saves()
    then restore must reproduce the exact state."""
    import jax
    from transeditor_tpu.config import ModelConfig, TrainConfig
    from transeditor_tpu.io.checkpoint import (restore_train_state,
                                               save_train_state,
                                               wait_for_saves)
    from transeditor_tpu.train.gan import init_state

    cfg = ModelConfig(size=16, style_dim=32, param_dim=32,
                      max_channels=32, n_trans=1)
    tcfg = TrainConfig(batch_size=2)
    state = init_state(cfg, tcfg, jax.random.PRNGKey(0))
    save_train_state(str(tmp_path), 7, state, async_save=True)
    wait_for_saves()
    restored, step = restore_train_state(str(tmp_path), state)
    assert step == 7
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(restored.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
