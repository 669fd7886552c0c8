"""Measure the REAL per-chip HBM watermark of the flagship programs.

VERDICT r4 #6: the HBM-fit claims for the multi-chip variants need a
device-memory basis.  The pure-DP per-chip train-step program IS the
single-chip batch-16 program, so its live watermark on the v5e anchors
the activation/workspace term of ``scripts/hbm_model.py``.

Runs (on axon) the batch-16 full-reg train step and the batch-256
sampling program, then reads ``device.memory_stats()`` (PJRT exposes
``bytes_in_use`` / ``peak_bytes_in_use`` when the backend supports it)
and writes docs/perf/v5e_memory_stats_r5.json.  If the tunnelled
backend hides memory stats, the documented attempt IS the artifact.

Run:  python scripts/v5e_memory_probe.py     (~12 min: conv warmup)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transeditor_tpu.config import ModelConfig, TrainConfig
    from transeditor_tpu.train.gan import init_state, make_train_step

    dev = jax.devices()[0]
    report = {"device": str(dev), "platform": dev.platform,
              "ts": time.strftime("%Y-%m-%d %H:%M:%S")}

    def stats(tag):
        try:
            ms = dev.memory_stats()
        except Exception as e:
            report.setdefault("memory_stats_errors", []).append(
                f"{tag}: {type(e).__name__}: {e}")
            return None
        if not ms:
            report.setdefault("memory_stats_errors", []).append(
                f"{tag}: empty")
            return None
        keep = {k: int(v) for k, v in ms.items()
                if isinstance(v, (int, float))}
        report[f"memory_stats_{tag}"] = keep
        return keep

    stats("baseline")

    cfg = ModelConfig(size=256, dtype="bfloat16")
    tcfg = TrainConfig(batch_size=16)
    t0 = time.time()
    state = jax.jit(lambda k: init_state(cfg, tcfg, k))(
        jax.random.PRNGKey(7))
    step = make_train_step(cfg, tcfg)
    real = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (16, 256, 256, 3), np.uint8))
    s, m = step(state, real, jax.random.PRNGKey(8),
                do_d_reg=True, do_g_reg=True)
    # force completion: scalar fetch (block_until_ready lies on axon)
    float(np.asarray(jnp.sum(jax.tree.leaves(m)[0])))
    report["fullreg_warmup_s"] = round(time.time() - t0, 1)
    st = stats("after_fullreg_step")
    if st and "peak_bytes_in_use" in st:
        report["train_fullreg_peak_bytes"] = st["peak_bytes_in_use"]
    del s, m, state

    import bench
    params, sample_many, batch = bench.build_sampler(cfg, 256, 2)
    float(np.asarray(sample_many(params, jax.random.PRNGKey(1))))
    st = stats("after_sampling_b256")
    if st and "peak_bytes_in_use" in st:
        report["sampling_b256_peak_bytes"] = st["peak_bytes_in_use"]

    out = os.path.join(ROOT, "docs", "perf", "v5e_memory_stats_r5.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
