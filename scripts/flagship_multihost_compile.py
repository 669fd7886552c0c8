"""Certify the FLAGSHIP programs under a REAL multi-process mesh.

VERDICT r4 #5: round 4's zero-GSPMD-warning certification
(``scripts/flagship_mesh_compile.py``) was single-process; the
reference's launch protocol is multi-HOST
(``/root/reference/README.md:45-49``, ``torch.distributed.launch``),
and our analogue (``jax.distributed.initialize`` + a global mesh over
per-host local devices) had only ever seen toy shapes
(``tests/test_multihost_2proc.py``).  This script spawns TWO worker
processes, each owning 4 virtual CPU devices, wires them through
``jax.distributed.initialize``, and AOT-lowers + compiles the flagship
256px full-reg train step at production shape
(``/root/reference/train_spatial_query.py:381-391``) over:

  * the (data=4, model=2) mesh — the variant round 4 certified
    single-process, so the collective-byte accounting MUST match
    ``docs/perf/flagship_mesh_compile_r4.json`` exactly (the HLO is a
    function of mesh+shape, not of process topology), and
  * the pure-DP (data=8,) mesh — the recommended production scale-out.

Each rank captures fd 2 during compilation (``utils/capture.capture_fd2``)
and self-gates on zero spmd_partitioner warnings; rank 0 writes
``docs/perf/flagship_multihost_compile_r5.json`` including the
byte-level comparison against the single-process report.

Compile-only (ShapeDtypeStructs — no state is materialized, nothing
executes except the final cross-host barrier), so the 1-core box's
collective-scheduling pathologies (CLAUDE.md) never trigger; both ranks
compile concurrently and independently, exactly as real pod hosts do.

Run:  python scripts/flagship_multihost_compile.py [--out PATH]
      (~15-25 min: two concurrent flagship compiles per variant on one
      core)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
sys.path.insert(0, os.environ["REPO"])

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.parallel import multihost
from transeditor_tpu.parallel.mesh import create_mesh, param_shardings
from transeditor_tpu.train.gan import init_state, make_train_step
from transeditor_tpu.utils.capture import capture_fd2, gspmd_warning_lines
sys.path.insert(0, os.path.join(os.environ["REPO"], "scripts"))
from flagship_mesh_compile import collective_stats, with_shardings

rank = int(os.environ["PROCESS_ID"])
assert multihost.initialize()
assert multihost.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

cfg = ModelConfig(size=256, dtype="bfloat16")
tcfg = TrainConfig(batch_size=16 * 4)    # 16 per chip, the ref recipe
state_sds = jax.eval_shape(lambda k: init_state(cfg, tcfg, k),
                           jax.random.PRNGKey(0))
key0 = jax.eval_shape(lambda: jax.random.PRNGKey(0))
reg = dict(do_d_reg=True, do_g_reg=True)

report = {}
variants = {
    "fullreg": create_mesh(n_data=4, n_model=2),
    "fullreg_dp8": create_mesh(n_data=8, n_model=1),
}
for name, mesh in variants.items():
    step = make_train_step(cfg, tcfg, mesh=mesh)
    st = with_shardings(state_sds, param_shardings(state_sds, mesh))
    real_sds = jax.ShapeDtypeStruct(
        (tcfg.batch_size, cfg.size, cfg.size, 3), jnp.uint8,
        sharding=NamedSharding(mesh, P("data")))
    key_sds = jax.ShapeDtypeStruct(
        key0.shape, key0.dtype, sharding=NamedSharding(mesh, P()))
    box = []
    with capture_fd2(box):
        t0 = time.perf_counter()
        compiled = step.lower(st, real_sds, key_sds, **reg).compile()
        dt = time.perf_counter() - t0
    warns = gspmd_warning_lines(box[-1])
    entry = {"compile_s": round(dt, 1), "spmd_warnings": len(warns)}
    if warns:
        entry["warning_sample"] = warns[:3]
    try:
        entry["collectives"] = collective_stats(compiled.as_text())
    except Exception as e:
        entry["collectives_error"] = f"{type(e).__name__}: {e}"
    report[name] = entry
    print(f"[rank {rank}] {name}: {dt:.1f}s, {len(warns)} warnings",
          flush=True)

with open(os.environ["OUT"] + f".rank{rank}", "w") as f:
    json.dump(report, f, indent=1)
multihost.synchronize("compile-done")
print(f"COMPILEOK rank={rank}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "perf", "flagship_multihost_compile_r5.json"))
    ap.add_argument("--single_ref", default=os.path.join(
        REPO, "docs", "perf", "flagship_mesh_compile_r5.json"))
    args = ap.parse_args()

    port = _free_port()
    tmp_out = os.path.join("/tmp", "fmh_compile")
    t0 = time.time()
    procs = []
    for rank in range(2):
        env = dict(os.environ, REPO=REPO, OUT=tmp_out,
                   JAX_PLATFORMS="cpu",
                   COORDINATOR_ADDRESS=f"localhost:{port}",
                   NUM_PROCESSES="2", PROCESS_ID=str(rank))
        env.pop("PYTHONPATH", None)  # keep axon out of the workers
        # generous XLA:CPU collective timeouts for the final barrier on
        # this 1-core box (CLAUDE.md rendezvous-watchdog lesson)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
            " --xla_cpu_collective_timeout_seconds=1200").strip()
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=3600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        print(f"--- rank {rank} log tail ---")
        print("\n".join(out.splitlines()[-12:]))
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"COMPILEOK rank={rank}" in out

    ranks = []
    for rank in range(2):
        with open(tmp_out + f".rank{rank}") as f:
            ranks.append(json.load(f))

    report = {"topology": "2 processes x 4 local CPU devices",
              "mesh": {"fullreg": "data=4,model=2",
                       "fullreg_dp8": "data=8"},
              "size": 256, "batch_per_chip": 16,
              "wall_s": round(time.time() - t0, 1)}
    total_warn = 0
    for name in ranks[0]:
        a, b = ranks[0][name], ranks[1][name]
        # both ranks compiled the same global program: their collective
        # accounting must agree bit-for-bit
        assert a.get("collectives") == b.get("collectives"), (name, a, b)
        total_warn += a["spmd_warnings"] + b["spmd_warnings"]
        report[name] = {
            "compile_s_rank0": a["compile_s"],
            "compile_s_rank1": b["compile_s"],
            "spmd_warnings": a["spmd_warnings"] + b["spmd_warnings"],
            "collectives": a.get("collectives"),
        }
    report["total_spmd_warnings"] = total_warn

    # the multi-process HLO must move exactly the bytes the
    # single-process certification measured (same mesh, same shapes)
    if os.path.exists(args.single_ref):
        with open(args.single_ref) as f:
            single = json.load(f)
        cmp = {}
        for name in ("fullreg", "fullreg_dp8"):
            got = (report.get(name, {}).get("collectives") or {}
                   ).get("total_bytes")
            want = (single.get(name, {}).get("collectives") or {}
                    ).get("total_bytes")
            cmp[name] = {"multihost_bytes": got,
                         "single_process_bytes": want,
                         "match": got == want}
        report["vs_single_process"] = cmp

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = (total_warn == 0 and all(
        v["match"] for v in report.get("vs_single_process", {}).values()))
    print("MULTIHOST_COMPILE_OK" if ok else "MULTIHOST_COMPILE_FAIL",
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
