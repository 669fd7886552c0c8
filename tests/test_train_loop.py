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
    # machine-readable scalar stream (one JSON object per logged step)
    import json
    with open(tmp_path / "t" / "tb" / "metrics.jsonl") as f:
        rows = [json.loads(line) for line in f]
    assert rows and rows[0]["step"] == 0 and "d" in rows[0]


def test_metric_logger_wandb_sink(tmp_path, monkeypatch):
    """MetricLogger drives wandb when installed + requested, and
    degrades silently when the package is absent (the reference's gated
    ``if wandb and args.wandb`` pattern, train_spatial_query.py:16-20,
    324-339)."""
    import sys
    import types

    from transeditor_tpu.train.loop import MetricLogger

    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda metrics, step=None: calls["log"].append(
        (step, metrics))
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    logger = MetricLogger(None, use_wandb=True, wandb_project="proj")
    logger.log(0, {"d": 1.0, "g": 2.0})
    logger.log(7, {"d": 0.5})
    logger.close()
    assert calls["init"] == [{"project": "proj"}]
    assert calls["log"] == [(0, {"d": 1.0, "g": 2.0}), (7, {"d": 0.5})]
    assert calls["finish"] == 1

    # absent package: requested wandb degrades to the other sinks
    monkeypatch.delitem(sys.modules, "wandb")
    monkeypatch.setattr("builtins.__import__", _blocking_import("wandb"))
    logger = MetricLogger(None, use_wandb=True)
    assert logger.wandb is None
    logger.log(0, {"d": 1.0})
    logger.close()


def _blocking_import(blocked):
    real_import = __import__

    def imp(name, *a, **kw):
        if name == blocked:
            raise ImportError(name)
        return real_import(name, *a, **kw)

    return imp


def test_train_loop_preemption_checkpoint(tmp_path):
    """SIGTERM mid-run: the loop finishes the in-flight step, writes a
    checkpoint named like the cadence saves (name i == state after step
    i), and a real resume (start_step = ckpt_step + 1, the
    cli/train_gan convention) executes step i+1 next — no step skipped,
    at most one lost."""
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
    # prefetch=0: this test pins EXACT step-boundary accounting via the
    # iterator as the signal vehicle; with the default prefetcher the
    # iterator runs ~depth batches ahead of the loop, so the signal
    # would land earlier (the prefetching variant is covered by
    # test_train_loop_preemption_with_prefetch)
    state = train(cfg, tcfg, preempting_iter(), out_dir=str(tmp_path),
                  exp_name="p", mesh=None, prefetch=0)
    assert int(state.step) == 3  # steps 0..2 ran, 3..49 preempted away
    restored, step = restore_train_state(
        str(tmp_path / "p" / "checkpoint"), state)
    # the shutdown checkpoint uses the cadence naming: name 2 holds the
    # state after step 2 (state.step counter == 3)
    assert step == 2
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(state.step))
    # the handler uninstalled itself after the first signal
    assert signal.getsignal(signal.SIGTERM) is prev_handler

    # real resume: continue exactly as cli/train_gan.py does
    # (start_step = ckpt_step + 1) and track which step indices run —
    # the next executed step must be 3 (i+1), not 4
    executed = []

    def tracking_iter():
        n = 0
        for batch in base:
            executed.append(None)
            yield batch

    start_step = step + 1
    assert start_step == int(restored.step)
    resumed = train(cfg, tcfg, tracking_iter(), out_dir=str(tmp_path),
                    exp_name="p", mesh=None, state=restored,
                    start_step=start_step, max_steps=1, prefetch=0)
    assert len(executed) == 1  # exactly one step (index 3) executed
    assert int(resumed.step) == 4  # steps 0..3 have now run, none skipped


def test_train_loop_preemption_with_prefetch(tmp_path):
    """Preemption under the DEFAULT device-prefetcher (round 5): the
    iterator runs ahead of the loop, so the exact interrupt step is
    pipeline-dependent — what must hold is the CONTRACT: the loop exits
    cleanly after some completed step s >= 0, writes the shutdown
    checkpoint under the cadence name s, and a resume from s+1 executes
    step s+1 (at most one step lost, none skipped)."""
    cfg = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                      n_trans=1)
    tcfg = TrainConfig(total_steps=50, batch_size=4, n_sample=4,
                       sample_every=1000, checkpoint_every=1000)
    data = np.random.RandomState(0).randint(
        0, 255, (16, 16, 16, 3), np.uint8)
    base = make_train_iterator(ArraySource(data), 4, 16)

    def preempting_iter():
        n = 0
        for batch in base:
            if n == 4:
                os.kill(os.getpid(), signal.SIGTERM)
            n += 1
            yield batch

    state = train(cfg, tcfg, preempting_iter(), out_dir=str(tmp_path),
                  exp_name="pp", mesh=None)
    s = int(state.step) - 1
    assert 0 <= s < 49  # preempted, not run to completion
    restored, step = restore_train_state(
        str(tmp_path / "pp" / "checkpoint"), state)
    assert step == s
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(state.step))
    resumed = train(cfg, tcfg, base, out_dir=str(tmp_path),
                    exp_name="pp", mesh=None, state=restored,
                    start_step=step + 1, max_steps=1)
    assert int(resumed.step) == s + 2  # step s+1 executed next
