"""Deviceless XLA:TPU AOT compile of the flagship multi-chip programs.

VERDICT r4 #6(a) asked for a real-TPU-HLO memory basis for the
multi-chip variants; round 5 found that
``jax.experimental.topologies.get_topology_desc("v5e:2x4")`` works on
this box (the TPU *compiler* is local; only devices are remote), so the
flagship 256px full-reg train step can be compiled FOR a v5e-8 mesh
with XLA:TPU's own buffer assignment — authoritative per-chip HBM
numbers, not CPU-backend artifacts.

This promptly caught a real defect: without sharding constraints on
the step's internally sampled batches (G-step latents, path-reg
latents/noise), GSPMD kept those branches REPLICATED per chip — ~1.9x
the per-device FLOPs and an OOM against the 16 GB budget from batch-64
path-reg activations (the round-4 zero-resharding-warning gate could
not see this: replication emits no warning).  ``make_train_step`` now
takes ``mesh`` and constrains them; this script certifies the fixed
programs and writes docs/perf/deviceless_tpu_aot_r5.json.

Run:  python scripts/deviceless_tpu_aot.py   (~25 min local TPU-compiler
      time on this 1-core box; no TPU device needed)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HBM_PER_V5E = 16 * 1024 ** 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        ROOT, "docs", "perf", "deviceless_tpu_aot_r5.json"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from transeditor_tpu.config import ModelConfig, TrainConfig
    from transeditor_tpu.parallel.mesh import param_shardings
    from transeditor_tpu.train.gan import init_state, make_train_step

    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    devs = np.array(topo.devices)
    cfg = ModelConfig(size=256, dtype="bfloat16")

    report = {"topology": "deviceless v5e:2x4 (8 chips)",
              "hbm_per_chip_bytes": HBM_PER_V5E,
              "size": 256, "batch_per_chip": 16}
    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)

    key0 = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    variants = {
        "fullreg_dp8": dict(shape=(8, 1), fsdp=False),
        "fullreg_tp2": dict(shape=(4, 2), fsdp=False),
        "fullreg_tp2_fsdp": dict(shape=(4, 2), fsdp=True),
    }
    for name, v in variants.items():
        if args.only and name != args.only:
            continue
        n_data = v["shape"][0]
        tcfg = TrainConfig(batch_size=16 * n_data)
        mesh = Mesh(devs.reshape(v["shape"]), ("data", "model"))
        state_sds = jax.eval_shape(lambda k: init_state(cfg, tcfg, k),
                                   jax.random.PRNGKey(0))
        sh = param_shardings(state_sds, mesh, fsdp=v["fsdp"])
        st = jax.tree.map(
            lambda s, h: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                              sharding=h),
            state_sds, sh)
        real = jax.ShapeDtypeStruct(
            (tcfg.batch_size, 256, 256, 3), jnp.uint8,
            sharding=NamedSharding(mesh, P("data")))
        key = jax.ShapeDtypeStruct(key0.shape, key0.dtype,
                                   sharding=NamedSharding(mesh, P()))
        step = make_train_step(cfg, tcfg, mesh=mesh)
        t0 = time.time()
        try:
            c = step.lower(st, real, key, do_d_reg=True,
                           do_g_reg=True).compile()
        except Exception as e:
            report[name] = {"error": f"{type(e).__name__}: "
                            f"{str(e)[:500]}"}
            print(f"[{name}] FAILED: {type(e).__name__}", flush=True)
            continue
        entry = {"compile_s": round(time.time() - t0, 1)}
        ma = c.memory_analysis()
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes",
                     "generated_code_size_in_bytes"):
            val = getattr(ma, attr, None)
            if val is not None:
                entry[attr] = int(val)
        # the production step donates the state: argument and output
        # buffers alias, so per-chip peak ~= args + temp (+ code)
        peak = (entry.get("argument_size_in_bytes", 0)
                + entry.get("temp_size_in_bytes", 0)
                + entry.get("generated_code_size_in_bytes", 0))
        entry["est_peak_bytes_donated"] = peak
        entry["est_peak_gib_donated"] = round(peak / 1024 ** 3, 2)
        entry["fits_16g_v5e"] = bool(peak < HBM_PER_V5E * 0.95)
        try:
            cost = c.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            if cost and "flops" in cost:
                entry["flops_per_device"] = float(cost["flops"])
        except Exception:
            pass
        report[name] = entry
        print(f"[{name}] {json.dumps(entry)}", flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
