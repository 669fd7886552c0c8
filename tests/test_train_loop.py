"""Smoke test for the training driver (3 steps on a tiny model)."""

import os
import signal

import numpy as np

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.data.dataset import ArraySource, make_train_iterator
from transeditor_tpu.io.checkpoint import restore_train_state
from transeditor_tpu.train.loop import train


def test_train_loop_smoke(tmp_path):
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                      n_trans=1)
    tcfg = TrainConfig(total_steps=3, batch_size=4, n_sample=4,
                       sample_every=2, checkpoint_every=2)
    data = np.random.RandomState(0).randint(
        0, 255, (16, 16, 16, 3), np.uint8)
    it = make_train_iterator(ArraySource(data), 4, 16)

    state = train(cfg, tcfg, it, out_dir=str(tmp_path), exp_name="t",
                  mesh=None, max_steps=3)
    assert int(state.step) == 3
    assert os.path.exists(tmp_path / "t" / "sample" / "000000.png")
    assert os.path.exists(tmp_path / "t" / "sample" / "000002.png")
    ckpts = os.listdir(tmp_path / "t" / "checkpoint")
    assert "000000" in ckpts and "000002" in ckpts


def test_train_loop_preemption_checkpoint(tmp_path):
    """SIGTERM mid-run: the loop finishes the in-flight step, writes a
    resumable checkpoint one past it, and returns early."""
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                      n_trans=1)
    # cadence intervals far beyond the interrupt point: any checkpoint
    # after step 0 can only come from the shutdown path
    tcfg = TrainConfig(total_steps=50, batch_size=4, n_sample=4,
                       sample_every=1000, checkpoint_every=1000)
    data = np.random.RandomState(0).randint(
        0, 255, (16, 16, 16, 3), np.uint8)
    base = make_train_iterator(ArraySource(data), 4, 16)

    def preempting_iter():
        n = 0
        for batch in base:
            if n == 2:  # fires while the loop is fetching step 2's data
                os.kill(os.getpid(), signal.SIGTERM)
            n += 1
            yield batch

    prev_handler = signal.getsignal(signal.SIGTERM)
    state = train(cfg, tcfg, preempting_iter(), out_dir=str(tmp_path),
                  exp_name="p", mesh=None)
    assert int(state.step) == 3  # steps 0..2 ran, 3..49 preempted away
    restored, step = restore_train_state(
        str(tmp_path / "p" / "checkpoint"), state)
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(state.step))
    # the handler uninstalled itself after the first signal
    assert signal.getsignal(signal.SIGTERM) is prev_handler
