"""Sampling / train-step scale-out shape on the virtual CPU mesh.

bench.py's endorsed scale-out route is data-parallel sampling over a
(data,) mesh (one batch shard per chip, params replicated).  Real
multi-chip hardware isn't reachable from this box, so this measures the
SHAPE of the scaling on N virtual CPU devices: per-chip batch held
fixed, the global batch grows with the mesh, and the metric reported is
aggregate img/s at each mesh size plus the GSPMD overhead vs ideal.

On a single physical core the ideal aggregate is FLAT (N virtual
devices share one core, so N x work takes N x time); any sub-flat curve
exposes collective/resharding overhead the GSPMD partitioner added on
top of pure compute.  On real chips the same program's aggregate
scales linearly because each shard owns a core's worth of silicon —
that linearity on hardware is exactly what `vs ideal ~= 1.0` here
predicts, and what tests/test_bench_mesh.py pins for correctness.

Run:  JAX_PLATFORMS=cpu python scripts/mesh_scaling.py           # sampling
      JAX_PLATFORMS=cpu python scripts/mesh_scaling.py --train   # train step
                       (full step, gradient psums over the data axis)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the train step's gradient all-reduces hit XLA:CPU's 40s rendezvous
# watchdog on a 1-core host (see CLAUDE.md) — widen it before jax init
_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from bench import build_sampler  # noqa: E402
from transeditor_tpu.config import ModelConfig  # noqa: E402
from transeditor_tpu.parallel import create_mesh  # noqa: E402

BATCH_PER_CHIP = 8
ITERS = 4
REPS = 3
# big enough that compute dwarfs dispatch, small enough for CPU
CFG = ModelConfig(size=32, n_trans=2, max_channels=256, dtype="float32")


def measure(n_dev: int) -> float:
    mesh = create_mesh(n_data=n_dev, n_model=1,
                       devices=jax.devices()[:n_dev])
    params, sample_many, batch = build_sampler(
        CFG, BATCH_PER_CHIP, ITERS, mesh)
    key = jax.random.PRNGKey(0)
    float(np.asarray(sample_many(params, key)))        # compile+run
    best = float("inf")
    for i in range(REPS):
        t0 = time.perf_counter()
        acc = float(np.asarray(sample_many(params, jax.random.fold_in(key, i))))
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(acc)
    return batch * ITERS / best


def measure_train(n_dev: int, fullreg: bool = False) -> float:
    """Aggregate train img/s: full step (D+G+EMA) on an (n_dev, 1) data
    mesh, per-chip batch fixed.  ``fullreg`` turns BOTH lazy
    second-order regularizers on — gradient psums of the R1 and
    path-length grad-of-grad passes are the heaviest collective load
    the recipe ever produces (VERDICT r3 #4), so its overhead-vs-flat
    is the honest upper bound on multi-chip sync cost."""
    from transeditor_tpu.config import TrainConfig
    from transeditor_tpu.parallel import shard_batch, shard_params
    from transeditor_tpu.train.gan import init_state, make_train_step

    mesh = create_mesh(n_data=n_dev, n_model=1,
                       devices=jax.devices()[:n_dev])
    tcfg = TrainConfig(batch_size=BATCH_PER_CHIP * n_dev)
    state = init_state(CFG, tcfg, jax.random.PRNGKey(0))
    state = state.replace(
        params_g=shard_params(state.params_g, mesh, min_size=32),
        params_d=shard_params(state.params_d, mesh, min_size=32),
        g_ema=shard_params(state.g_ema, mesh, min_size=32))
    real = shard_batch(
        jax.random.normal(jax.random.PRNGKey(1),
                          (tcfg.batch_size, CFG.size, CFG.size, 3)), mesh)
    step = make_train_step(CFG, tcfg, mesh=mesh)
    kw = dict(do_d_reg=True, do_g_reg=True) if fullreg else {}
    state, m = step(state, real, jax.random.PRNGKey(2), **kw)
    assert np.isfinite(float(m["d"]))
    if fullreg:
        assert np.isfinite(float(m["r1"])) and np.isfinite(float(m["path"]))
    best = float("inf")
    for i in range(REPS):
        t0 = time.perf_counter()
        state, m = step(state, real,
                        jax.random.fold_in(jax.random.PRNGKey(3), i), **kw)
        assert np.isfinite(float(m["d"]))                 # forces fetch
        best = min(best, time.perf_counter() - t0)
    return tcfg.batch_size / best


def main():
    global REPS
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--fullreg", action="store_true",
                    help="train step with BOTH lazy regs on")
    ap.add_argument("--out", default=None,
                    help="also write/merge the table to this JSON path")
    ap.add_argument("--devices", default="1,2,4,8",
                    help="mesh sizes to run in THIS process (fullreg "
                         "steps cost ~dev x 36s on the 1-core box — "
                         "run sizes as separate bounded processes and "
                         "merge via --out)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    REPS = args.reps
    if args.train or args.fullreg:
        fn = lambda n: measure_train(n, fullreg=args.fullreg)
    else:
        fn = measure
    mode = ("train_fullreg" if args.fullreg else
            "train" if args.train else "sampling")
    table = {"mode": mode, "size": CFG.size,
             "max_channels": CFG.max_channels,
             "batch_per_chip": BATCH_PER_CHIP, "table": []}
    if args.out and os.path.exists(args.out):   # merge partial runs
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("mode") == mode:
            table = prev
        else:
            # a mode mismatch on a NAMED --out would silently clobber
            # hours of committed 1-core measurements — refuse
            ap.error(f"--out {args.out} holds mode={prev.get('mode')!r}"
                     f", refusing to overwrite with mode={mode!r}; "
                     "pass a different --out or delete the file")
    done = {r["devices"] for r in table["table"]}
    for n in [int(v) for v in args.devices.split(",")]:
        if n in done:
            continue
        rate = fn(n)
        table["table"].append(
            {"devices": n, "global_batch": BATCH_PER_CHIP * n,
             "img_per_s": round(rate, 3)})
        print(json.dumps(table["table"][-1]), flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(table, f, indent=1)
    table["table"].sort(key=lambda r: r["devices"])
    base = table["table"][0]["img_per_s"] if table["table"] else None
    for r in table["table"]:
        r["vs_ideal_flat"] = round(r["img_per_s"] / base, 3)
    print(json.dumps(table))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=1)


if __name__ == "__main__":
    main()
