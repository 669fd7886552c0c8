"""End-to-end smoke of the train_gan CLI (the train_spatial_query.py
entry point): image folder in, 3 steps on a tiny model, artifacts out.
Exercises the single-process multihost degradation and the shared
architecture flags along the way."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_train_gan_cli_smoke(tmp_path, monkeypatch):
    from PIL import Image
    from transeditor_tpu.cli import train_gan

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 256, (16, 16, 3),
                                    dtype=np.uint8)).save(
            data_dir / f"{i}.png")

    # keep the model tiny: the CLI flag set must carry it end to end
    monkeypatch.setattr(
        "transeditor_tpu.cli.train_gan.train",
        _wrap_max_steps(train_gan.train, 3))
    train_gan.main([
        str(data_dir), "--exp_name", "t", "--iter", "3",
        "--batch", "4", "--n_sample", "4",
        "--size", "16", "--num_trans", "1", "--dtype", "float32",
        "--out_dir", str(tmp_path / "out"),
    ])
    out = tmp_path / "out" / "t"
    assert os.path.exists(out / "sample" / "000000.png")
    assert os.path.isdir(out / "checkpoint")


def _wrap_max_steps(train_fn, n):
    def wrapped(*a, **kw):
        kw["max_steps"] = n
        return train_fn(*a, **kw)
    return wrapped


@pytest.mark.slow
def test_train_gan_cli_resume_cycle(tmp_path, capsys, monkeypatch):
    """Crash-recovery story end to end: train 2 steps, relaunch with
    --resume, and the run continues at the checkpointed step + 1 with
    the restored state (the reference's --ckpt restart,
    train_spatial_query.py:475-492).  The 10k checkpoint cadence is
    shrunk to 2 so the resumed run provably writes a LATER step."""
    import dataclasses
    from PIL import Image
    from transeditor_tpu.cli import train_gan

    orig_build = train_gan.build_configs
    monkeypatch.setattr(
        train_gan, "build_configs",
        lambda args: (lambda c, t: (c, dataclasses.replace(
            t, checkpoint_every=2)))(*orig_build(args)))

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(8):
        Image.fromarray(rng.randint(0, 256, (16, 16, 3),
                                    dtype=np.uint8)).save(
            data_dir / f"{i}.png")

    common = [
        str(data_dir), "--exp_name", "r", "--batch", "4",
        "--n_sample", "4", "--size", "16", "--num_trans", "1",
        "--dtype", "float32", "--out_dir", str(tmp_path / "out"),
    ]
    train_gan.main(common + ["--iter", "2"])
    ckpt_dir = tmp_path / "out" / "r" / "checkpoint"
    steps = sorted(os.listdir(ckpt_dir))
    assert steps, "first run wrote no checkpoint"

    train_gan.main(common + ["--iter", "4", "--resume", str(ckpt_dir)])
    out = capsys.readouterr().out
    assert "resumed from step" in out
    # the resumed run reaches (and checkpoints) strictly later steps
    later = sorted(os.listdir(ckpt_dir))
    assert set(later) - set(steps), (
        f"resume wrote no new checkpoint: {steps} -> {later}")
