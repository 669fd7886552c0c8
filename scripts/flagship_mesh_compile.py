"""AOT-compile the FLAGSHIP programs on a virtual 8-device mesh.

VERDICT r3 #1b: the 256px train-step (plain / full-reg / FSDP) and the
batch-256 sampling program had only ever been compiled at toy shapes on
a multi-device mesh; sharding pathologies are shape-dependent.  This
script lowers and compiles all four at the production shapes
(``/root/reference/train_spatial_query.py:381-391,494-509`` — 256px,
batch 16/chip) over an 8-virtual-CPU-device (data=4, model=2) mesh
(sampling over (data=8,)), captures the XLA compile log, and writes
``docs/perf/flagship_mesh_compile_r4.json`` with per-variant compile
wall time and spmd_partitioner warning counts.

AOT only — ``.lower(...).compile()`` on ShapeDtypeStructs — so no
parameter or activation memory is materialized; this certifies that the
flagship programs PARTITION cleanly, which no real-chip resource on
this box can otherwise exercise.

Run:  python scripts/flagship_mesh_compile.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    " --xla_cpu_collective_timeout_seconds=1200").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.parallel.mesh import create_mesh, param_shardings
from transeditor_tpu.train.gan import init_state, make_train_step
from transeditor_tpu.utils.capture import capture_fd2, gspmd_warning_lines


def with_shardings(sds_tree, sharding_tree):
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        sds_tree, sharding_tree)


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def collective_stats(hlo_text: str) -> dict:
    """Sum the bytes each collective op moves in an optimized HLO
    module — the hardware-relevant overhead statement for a REAL
    multi-chip deployment (the virtual-CPU timing curve in
    docs/perf/mesh_scaling_train_r4.json is confounded by 1-core
    thread-rendezvous; collective BYTES are deterministic).

    Counts the output shape of every all-reduce / reduce-scatter /
    all-gather / collective-permute / all-to-all instruction.
    """
    import re
    out = {}
    # output type may be a TUPLE — XLA buckets gradient all-reduces
    # into one op with a tuple result: `%ar = (f32[..], f32[..]) \
    # all-reduce(...)`.  Capture the whole result-type string and sum
    # every dtype[dims] inside it.
    line_pat = re.compile(
        r"=\s*((?:\([^)]*\))|(?:[a-z0-9]+\[[0-9,]*\][^=\s]*))\s+"
        r"(all-reduce|reduce-scatter|all-gather|collective-permute"
        r"|all-to-all)(?:-start)?\(")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for m in line_pat.finditer(hlo_text):
        type_str, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_pat.findall(type_str):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        if nbytes == 0:
            continue
        key = op.replace("-", "_")
        out.setdefault(key, {"ops": 0, "bytes": 0})
        out[key]["ops"] += 1
        out[key]["bytes"] += nbytes
    out["total_bytes"] = sum(v["bytes"] for v in out.values()
                             if isinstance(v, dict))
    return out


def compile_one(label, lower_fn, report):
    box = []
    with capture_fd2(box):    # live-tees to the real stderr
        t0 = time.perf_counter()
        compiled = lower_fn()
        dt = time.perf_counter() - t0
    warn_lines = gspmd_warning_lines(box[-1])
    entry = {"compile_s": round(dt, 1), "spmd_warnings": len(warn_lines)}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            entry["temp_bytes_per_device"] = int(
                getattr(ma, "temp_size_in_bytes", 0))
            entry["argument_bytes_per_device"] = int(
                getattr(ma, "argument_size_in_bytes", 0))
    except Exception:
        pass
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        if cost and "flops" in cost:
            entry["flops_per_device"] = float(cost["flops"])
    except Exception:
        pass
    try:
        entry["collectives"] = collective_stats(compiled.as_text())
    except Exception as e:
        entry["collectives_error"] = f"{type(e).__name__}: {e}"
    if warn_lines:
        entry["warning_sample"] = warn_lines[:3]
    report[label] = entry
    print(f"[{label}] compiled in {dt:.1f}s, "
          f"{len(warn_lines)} spmd warnings", flush=True)
    return compiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "docs", "perf",
        "flagship_mesh_compile_r5.json"))
    ap.add_argument("--only", default=None,
                    help="compile just this variant (debug iteration)")
    args = ap.parse_args()

    devices = jax.devices()
    assert len(devices) >= 8, devices
    mesh = create_mesh(n_data=4, n_model=2, devices=devices[:8])

    cfg = ModelConfig(size=256, dtype="bfloat16")
    tcfg = TrainConfig(batch_size=16 * 4)  # 16 per chip, the ref recipe

    key0 = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    key_sds = jax.ShapeDtypeStruct(
        key0.shape, key0.dtype, sharding=NamedSharding(mesh, P()))
    real_sds = jax.ShapeDtypeStruct(
        (tcfg.batch_size, cfg.size, cfg.size, 3), jnp.uint8,
        sharding=NamedSharding(mesh, P("data")))
    state_sds = jax.eval_shape(
        lambda k: init_state(cfg, tcfg, k), jax.random.PRNGKey(0))

    report = {"mesh": "data=4,model=2", "size": cfg.size,
              "batch_per_chip": 16, "dtype": cfg.dtype}
    if args.only and os.path.exists(args.out):
        # debug iteration on one variant must MERGE into the committed
        # report, never clobber the other variants' evidence
        with open(args.out) as f:
            report = json.load(f)

    reg = dict(do_d_reg=True, do_g_reg=True)
    # pure-DP mesh for the recommended-production comparison: the
    # (4,2) tp=2 variants move activation-sized collectives (tens of
    # GB/step at 256px — see the committed collectives numbers); dp8
    # moves only gradient-sized all-reduces.  tp/FSDP remain the
    # memory-relief options, dp the throughput recommendation
    # (SURVEY §2.9: the scaling dimension is batch).
    dp_mesh = create_mesh(n_data=8, n_model=1, devices=devices[:8])
    for name, m, fsdp, kw in (("plain", mesh, False, {}),
                              ("fullreg", mesh, False, reg),
                              ("fullreg_fsdp", mesh, True, reg),
                              ("fullreg_dp8", dp_mesh, False, reg)):
        if args.only and name != args.only:
            continue
        st = with_shardings(state_sds, param_shardings(state_sds, m,
                                                       fsdp=fsdp))
        real_m = jax.ShapeDtypeStruct(
            real_sds.shape, real_sds.dtype,
            sharding=NamedSharding(m, P("data")))
        key_m = jax.ShapeDtypeStruct(
            key_sds.shape, key_sds.dtype, sharding=NamedSharding(m, P()))
        # per-mesh step: internally sampled batches constrained over
        # 'data' (round-5 fix — without it GSPMD replicates the G-step
        # and path-reg branches per chip; see make_train_step)
        step = make_train_step(cfg, tcfg, mesh=m)
        compile_one(
            name,
            lambda st=st, kw=kw, real_m=real_m, key_m=key_m,
            step=step: step.lower(st, real_m, key_m, **kw).compile(),
            report)

    # batch-256 sampling (the serving/eval shape) over a pure-DP mesh
    if not args.only or args.only == "sampling_b256":
        import bench
        params_sds, sample_many, batch = bench.build_sampler(
            cfg, batch_per_chip=32, iters=2, mesh=dp_mesh,
            init_params=False)
        skey_sds = jax.ShapeDtypeStruct(
            key0.shape, key0.dtype, sharding=NamedSharding(dp_mesh, P()))
        assert batch == 256, batch
        compile_one(
            "sampling_b256",
            lambda: sample_many.lower(params_sds, skey_sds).compile(),
            report)

    total_warn = sum(v.get("spmd_warnings", 0) for v in report.values()
                     if isinstance(v, dict))
    report["total_spmd_warnings"] = total_warn
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("FLAGSHIP_COMPILE_OK" if total_warn == 0 else
          "FLAGSHIP_COMPILE_WARNINGS", flush=True)


if __name__ == "__main__":
    main()
