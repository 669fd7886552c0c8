"""Device-trace the TRAINING step (the sampling-trace treatment, r3).

VERDICT r2 #5: the production workload — the 800k-iteration training
recipe (``train_spatial_query.py:125-371``) — only ever had wall-clock
numbers (151 ms plain / 261 ms full-reg, BASELINE.md).  This script
gives it the same evidence the sampling path got in round 2
(docs/perf/TRACE_ANALYSIS.md):

  * times the plain and full-reg step variants at the flagship config
    (256px, batch 16, bf16 compute) on the real chip,
  * captures a ``jax.profiler`` device trace of each variant,
  * aggregates the device events (model_flops / raw_bytes_accessed /
    duration per fusion) into a roofline table and an MFU figure.

Artifacts: /tmp/trace_train/{plain,fullreg}/...trace.json.gz plus an
analysis JSON printed to stdout; docs/perf/TRACE_TRAIN.md is written
from these numbers.

Usage (on this box; ~15-25 min incl. the terminal conv warmup):
  python scripts/trace_train.py [--batch 16] [--steps 10]
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = "/tmp/trace_train"

V5E_BF16_PEAK = 197e12
V5E_HBM_PEAK = 819e9


def build(batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transeditor_tpu.config import ModelConfig, TrainConfig
    from transeditor_tpu.train.gan import init_state, make_train_step

    cfg = ModelConfig(size=256, dtype="bfloat16")
    tcfg = TrainConfig(batch_size=batch)
    state = jax.jit(lambda k: init_state(cfg, tcfg, k))(
        jax.random.PRNGKey(0))
    step = make_train_step(cfg, tcfg, donate=False)

    real = jnp.asarray(
        np.random.RandomState(0).randint(
            0, 256, (batch, cfg.size, cfg.size, 3), np.uint8))

    @jax.jit
    def checksum(state, metrics):
        leaves = jax.tree.leaves(state.params_g) + jax.tree.leaves(metrics)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    return state, step, real, checksum


def fetch(x):
    import numpy as np
    return float(np.asarray(x))


def run_variant(tag, state, step, real, checksum, n_steps, kwargs):
    """Time ``n_steps`` chained steps (axon: completion is forced by a
    scalar checksum fetch, block_until_ready does not block) and then
    capture a profiler trace of 2 chained steps."""
    import jax

    key = jax.random.PRNGKey(42)
    # warmup/compile
    s, m = step(state, real, jax.random.fold_in(key, 0), **kwargs)
    fetch(checksum(s, m))

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        s = state
        for i in range(n_steps):
            s, m = step(s, real, jax.random.fold_in(key, i), **kwargs)
        fetch(checksum(s, m))
        best = min(best, (time.perf_counter() - t0) / n_steps)
    print(f"{tag}: {best * 1e3:.1f} ms/step "
          f"({real.shape[0] / best:.1f} img/s)", flush=True)

    logdir = os.path.join(WORK, tag)
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    s, m = step(state, real, jax.random.fold_in(key, 99), **kwargs)
    s, m = step(s, real, jax.random.fold_in(key, 100), **kwargs)
    fetch(checksum(s, m))
    jax.profiler.stop_trace()
    return best, logdir


def analyze(logdir, n_traced_steps, ms_per_step):
    """Aggregate device events of the captured trace into a roofline
    table (top fusions by time) + whole-step totals/MFU."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return {"error": f"no trace.json.gz under {logdir}"}
    with gzip.open(paths[0]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # resolve the device plane's thread ids: "XLA Modules" (one event
    # per executed program) vs "XLA Ops" (one event per fusion) — the
    # planes overlap, so they must not be summed together
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name")
    module_ms = sum(
        int(e["args"]["device_duration_ps"]) / 1e9
        for e in events
        if tids.get((e.get("pid"), e.get("tid"))) == "XLA Modules"
        and "device_duration_ps" in (e.get("args") or {}))
    per_op = {}
    tot_time = tot_flops = tot_bytes = 0.0
    for e in events:
        a = e.get("args") or {}
        if ("device_duration_ps" not in a
                or tids.get((e.get("pid"), e.get("tid"))) != "XLA Ops"):
            continue
        dur = int(a["device_duration_ps"]) / 1e12      # seconds
        fl = float(a.get("model_flops") or 0)
        by = float(a.get("raw_bytes_accessed") or 0)
        tot_time += dur
        tot_flops += fl
        tot_bytes += by
        r = per_op.setdefault(e["name"], {"cat": a.get("hlo_category"),
                                          "t": 0.0, "fl": 0.0, "by": 0.0,
                                          "n": 0})
        r["t"] += dur
        r["fl"] += fl
        r["by"] += by
        r["n"] += 1
    top = sorted(per_op.items(), key=lambda kv: -kv[1]["t"])[:25]
    rows = []
    for name, r in top:
        rows.append({
            "op": name, "cat": r["cat"], "calls": r["n"],
            "ms": round(r["t"] * 1e3 / n_traced_steps, 2),
            "gflops": round(r["fl"] / 1e9 / n_traced_steps, 1),
            "gb": round(r["by"] / 1e9 / n_traced_steps, 2),
            "tflops_s": round(r["fl"] / r["t"] / 1e12, 1) if r["t"] else 0,
            "gb_s": round(r["by"] / r["t"] / 1e9, 1) if r["t"] else 0,
        })
    # MFU / bandwidth against the MODULE device time (what one step
    # actually occupies the chip for); per-op "ops time" can exceed it
    # when async copies overlap compute
    dev_s = module_ms / 1e3 / n_traced_steps
    flops = tot_flops / n_traced_steps
    byts = tot_bytes / n_traced_steps
    return {
        "trace": paths[0],
        "device_ms_per_step": round(dev_s * 1e3, 1),
        "ops_busy_ms_per_step": round(tot_time * 1e3 / n_traced_steps, 1),
        "wall_ms_per_step": round(ms_per_step * 1e3, 1),
        "total_tflops_per_step": round(flops / 1e12, 2),
        "total_gb_per_step": round(byts / 1e9, 1),
        "mfu_vs_bf16_peak": round(
            flops / dev_s / V5E_BF16_PEAK, 3) if dev_s else 0,
        "avg_hbm_frac": round(
            byts / dev_s / V5E_HBM_PEAK, 3) if dev_s else 0,
        "top_ops": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(WORK, exist_ok=True)

    state, step, real, checksum = build(args.batch)
    out = {}
    for tag, kwargs in (
            ("plain", dict(do_d_reg=False, do_g_reg=False)),
            ("fullreg", dict(do_d_reg=True, do_g_reg=True))):
        dt, logdir = run_variant(tag, state, step, real, checksum,
                                 args.steps, kwargs)
        out[tag] = analyze(logdir, n_traced_steps=2, ms_per_step=dt)
    with open(os.path.join(WORK, "analysis.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("TRACE TRAIN OK")


if __name__ == "__main__":
    main()
