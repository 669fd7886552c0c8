"""Smoke test for the training driver (3 steps on a tiny model)."""

import os

import numpy as np

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.data.dataset import ArraySource, make_train_iterator
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
