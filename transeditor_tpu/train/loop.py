"""Training driver: schedule, logging, sampling, checkpointing.

Mirrors the reference loop's observable behaviour
(train_spatial_query.py:125-371): lazy-reg cadence (R1 every
``d_reg_every``, path reg every ``g_reg_every``), a fixed 64-sample
grid every ``sample_every`` iters from g_ema, checkpoints every
``checkpoint_every``, scalar logging — rebuilt around the pure jitted
step with host-side Python only deciding WHICH compiled variant runs.
"""

from __future__ import annotations

import functools
import os
import signal
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.io.checkpoint import save_train_state, wait_for_saves
from transeditor_tpu.models import Generator
from transeditor_tpu.parallel import create_mesh, shard_params
from transeditor_tpu.parallel.multihost import (any_flag, global_batch,
                                                is_main)
from transeditor_tpu.train.gan import (GANTrainState, init_state,
                                       make_train_step)
from transeditor_tpu.utils.image import make_grid, save_png
from transeditor_tpu.utils.sampling import sample_zp


class GracefulShutdown:
    """Preemption-safe shutdown: SIGTERM/SIGINT set a flag the train
    loop polls, so it finishes the in-flight step, writes a synchronous
    checkpoint, and returns cleanly.

    TPU pods are evicted with SIGTERM; the reference's only recovery is
    a manual restart from the last 10k-iteration checkpoint
    (train_spatial_query.py:361-371,475-492), losing up to
    ``checkpoint_every`` steps.  This bounds the loss to one step.  A
    second signal restores the previous handlers, so repeated Ctrl-C
    still kills a wedged process.

    On multi-host pods the loop never acts on this flag directly: it
    runs it through ``parallel.multihost.any_flag`` each iteration so
    all processes agree on the break step (see that helper's docstring
    for the deadlock this prevents).
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self._signals = signals
        self._prev = {}

    def __enter__(self):
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:
                # not the main thread (e.g. a test harness worker):
                # polling still works, we just can't install handlers
                break
        return self

    def _handler(self, signum, frame):
        self.requested = True
        self._restore()  # next signal falls through to the default

    def _restore(self):
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev = {}

    def __exit__(self, *exc):
        self._restore()
        return False


class MetricLogger:
    """Scalar logging: tensorboardX if available, always stdout, plus an
    optional wandb sink behind ``use_wandb`` with the reference's gated
    import (train_spatial_query.py:16-20,324-339,527-528: wandb is a
    soft dependency — absent package + requested flag degrades to the
    other sinks, exactly like the reference's ``if wandb and
    args.wandb`` guard).  When ``logdir`` is set, every ``log`` call
    also appends one JSON line to ``<logdir>/metrics.jsonl`` — a
    machine-readable stream the reference lacked."""

    def __init__(self, logdir: Optional[str], log_every: int = 50,
                 use_wandb: bool = False,
                 wandb_project: str = "transeditor_tpu"):
        self.writer = None
        self.log_every = log_every
        self.wandb = None
        self.jsonl = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(logdir)
            except ImportError:
                pass
            os.makedirs(logdir, exist_ok=True)
            self.jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb
                wandb.init(project=wandb_project)
                self.wandb = wandb
            except ImportError:
                pass

    def log(self, step: int, metrics: dict):
        if self.writer is not None:
            for k, v in metrics.items():
                self.writer.add_scalar(k, float(v), step)
        if self.wandb is not None:
            self.wandb.log({k: float(v) for k, v in metrics.items()},
                           step=step)
        if self.jsonl is not None:
            import json
            self.jsonl.write(json.dumps(
                {"step": step,
                 **{k: float(v) for k, v in metrics.items()}}) + "\n")
            self.jsonl.flush()
        if step % self.log_every == 0:
            msg = "; ".join(f"{k}: {float(v):.4f}" for k, v in
                            sorted(metrics.items()))
            print(f"[{step}] {msg}", flush=True)

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.wandb is not None:
            self.wandb.finish()
        if self.jsonl is not None:
            self.jsonl.close()


class _DevicePrefetcher:
    """Overlap host-side batch prep (loader decode + host->device upload)
    with device compute.

    Measured round 4 (v5e via axon, 256px/b16): the train step computes
    in ~160 ms averaged over the lazy-reg cadence, but the loop ran at
    ~750-800 ms/step — the serial ``next(data_iter)`` (C++ JPEG decode)
    plus the synchronous ~3 MB uint8 upload through the tunnel dominated.
    A depth-2 background thread that calls ``put_fn`` (device_put /
    global_batch) ahead of the consumer hides both behind the in-flight
    step.  Values and order are bit-identical to the serial path; only
    timing changes.  The thread is a daemon and additionally honours
    ``close()`` so tests don't leak it."""

    def __init__(self, data_iter, put_fn, depth: int = 2):
        import queue
        import threading
        self._q = queue.Queue(maxsize=depth)
        self._stop = False

        def worker():
            try:
                for x in data_iter:
                    if self._stop:
                        break
                    self._q.put(put_fn(x))
            except Exception as e:  # surface loader errors to consumer
                self._q.put(e)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __next__(self):
        x = self._q.get()
        if isinstance(x, Exception):
            raise x
        return x

    def close(self):
        self._stop = True
        # unblock a producer stuck in q.put
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass


def train(
    cfg: ModelConfig,
    tcfg: TrainConfig,
    data_iter: Iterator[np.ndarray],
    out_dir: str = "out",
    exp_name: str = "default",
    mesh=None,
    state: Optional[GANTrainState] = None,
    start_step: int = 0,
    max_steps: Optional[int] = None,
    fsdp: bool = False,
    use_wandb: bool = False,
    prefetch: int = 2,
) -> GANTrainState:
    gen = Generator(cfg)
    rng = jax.random.PRNGKey(tcfg.seed)
    if state is None:
        rng, init_key = jax.random.split(rng)
        state = init_state(cfg, tcfg, init_key)

    n_dev = len(jax.devices())
    if mesh is None and n_dev > 1 and tcfg.batch_size % n_dev == 0:
        mesh = create_mesh()
    if mesh is not None:
        # fsdp=True additionally shards large params + Adam moments over
        # 'data' (ZeRO-style; see parallel/mesh.py)
        state = state.replace(
            params_g=shard_params(state.params_g, mesh, fsdp=fsdp),
            params_d=shard_params(state.params_d, mesh, fsdp=fsdp),
            g_ema=shard_params(state.g_ema, mesh, fsdp=fsdp),
            opt_g=(shard_params(state.opt_g, mesh, fsdp=True)
                   if fsdp else state.opt_g),
            opt_d=(shard_params(state.opt_d, mesh, fsdp=True)
                   if fsdp else state.opt_d))

    # pass the mesh so internally sampled batches (G-step latents,
    # path-reg latents/noise) are constrained over 'data' — without
    # this GSPMD replicates those branches per chip (see
    # make_train_step's docstring)
    step_fn = make_train_step(cfg, tcfg, mesh=mesh)

    sample_dir = os.path.join(out_dir, exp_name, "sample")
    ckpt_dir = os.path.join(out_dir, exp_name, "checkpoint")
    os.makedirs(sample_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    # rank-0 logging/sampling, like the reference's get_rank()==0 gates
    # (train_spatial_query.py:308-359); checkpoints save on every host
    # (orbax coordinates multi-host saves itself)
    rank0 = is_main()
    logger = MetricLogger(os.path.join(out_dir, exp_name, "tb")
                          if rank0 else None,
                          use_wandb=use_wandb and rank0)

    # fixed visualization latents (reference :162-163)
    sample_key = jax.random.PRNGKey(tcfg.seed + 1)
    sample_z, sample_p = sample_zp(sample_key, tcfg.n_sample,
                                   cfg.n_tokens, cfg.style_dim)

    # replicated output so rank 0 can fetch the grid even when params
    # ride a multi-host mesh
    out_sharding = None
    if mesh is not None:
        from transeditor_tpu.parallel.mesh import replicated
        out_sharding = replicated(mesh)

    @functools.partial(jax.jit, out_shardings=out_sharding)
    def ema_sample(g_ema):
        out = gen.apply({"params": g_ema}, sample_z, sample_p)
        return out.image

    end = min(tcfg.total_steps,
              start_step + max_steps if max_steps else tcfg.total_steps)

    if mesh is not None:
        # multi-host: the loader yields this host's local shard and
        # put_fn builds the data-sharded global batch; single-host:
        # plain device_put with the 'data' sharding
        def put_fn(x):
            return global_batch(mesh, x)
    else:
        put_fn = jnp.asarray
    fetcher = (_DevicePrefetcher(data_iter, put_fn, depth=prefetch)
               if prefetch > 0 else None)

    t0 = time.perf_counter()
    imgs_seen = 0
    with GracefulShutdown() as stop:
        for i in range(start_step, end):
            real = (next(fetcher) if fetcher is not None
                    else put_fn(next(data_iter)))
            rng, step_key = jax.random.split(rng)
            state, metrics = step_fn(
                state, real, step_key,
                do_d_reg=(i % tcfg.d_reg_every == 0),
                do_g_reg=(i % tcfg.g_reg_every == 0),
                do_spatial_reg=(tcfg.spatial_regu
                                and i % tcfg.g_reg_every == 0))
            imgs_seen += real.shape[0]

            # materialising metrics forces a device sync; only do it on
            # the logging cadence so steps pipeline back-to-back in
            # between
            if rank0 and i % logger.log_every == 0:
                dt = time.perf_counter() - t0
                metrics = dict(metrics)
                metrics["imgs_per_sec"] = imgs_seen / max(dt, 1e-9)
                t0, imgs_seen = time.perf_counter(), 0
                logger.log(i, {k: float(v) for k, v in metrics.items()})

            if rank0 and i % tcfg.sample_every == 0:
                grid = make_grid(np.asarray(ema_sample(state.g_ema),
                                            np.float32),
                                 nrow=int(tcfg.n_sample ** 0.5))
                save_png(os.path.join(sample_dir, f"{i:06d}.png"), grid)

            if i % tcfg.checkpoint_every == 0:
                # background serialisation: the loop keeps stepping
                save_train_state(ckpt_dir, i, state, async_save=True)

            # SIGTERM delivery is per-process: agree on the flag across
            # hosts so every process breaks at the SAME step (else one
            # host enters the coordinated save while the rest are in
            # step i+1's collectives and both deadlock).  Free on a
            # single host.
            if any_flag(stop.requested):
                # preemption: persist the state AFTER this step under
                # the cadence naming convention (checkpoint `i` ==
                # state after step i), so the resume path's
                # start_step = ckpt_step + 1 continues at i+1 with at
                # most one step lost
                wait_for_saves()
                save_train_state(ckpt_dir, i, state, async_save=False)
                if rank0:
                    print(f"[{i}] shutdown signal: checkpointed state "
                          f"after step {i}, exiting", flush=True)
                break

    if fetcher is not None:
        fetcher.close()
    wait_for_saves()
    logger.close()
    return state
