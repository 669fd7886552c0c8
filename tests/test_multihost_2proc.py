"""REAL two-process multihost integration test.

Everything else validates the multi-host code in its single-process
degradation; this spawns TWO actual processes wired through
``jax.distributed.initialize`` (the COORDINATOR_ADDRESS env protocol
the pod launcher uses), each owning 2 virtual CPU devices, and checks:

  * the global mesh spans all 4 devices across both processes,
  * ``global_batch`` assembles a host-sharded global array from each
    host's local shard,
  * a jitted global reduction (XLA-inserted collective) returns the
    sum over BOTH hosts' data on both hosts,
  * ``reduce_loss_dict``/``synchronize`` work cross-process.

Real TPU pods remain untestable here, but this exercises the exact
process-coordination path they would use.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
sys.path.insert(0, os.environ["REPO"])

from transeditor_tpu.parallel import multihost

rank = int(os.environ["PROCESS_ID"])
assert multihost.initialize()          # env protocol
assert multihost.process_count() == 2
assert multihost.process_index() == rank
assert len(jax.devices()) == 4         # global view
assert len(jax.local_devices()) == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from transeditor_tpu.parallel.multihost import (global_batch,
                                                reduce_loss_dict,
                                                synchronize)

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))

# host r contributes rows full of (r+1); global batch = 4 rows
local = np.full((2, 8), rank + 1.0, np.float32)
g = global_batch(mesh, local)
assert g.shape == (4, 8)

total = jax.jit(jnp.sum)(g)            # global collective reduction
got = float(total)
want = float((1.0 + 2.0) * 2 * 8)
assert abs(got - want) < 1e-6, (got, want)

# loss-dict reduction (rank-0 mean semantics)
red = reduce_loss_dict({"d": jnp.asarray(float(rank))})
assert abs(float(red["d"]) - 0.5) < 1e-6, red

synchronize("done")
print(f"OK rank={rank} sum={got}")
"""


TRAIN_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ["LOCAL_DEVICES"]))
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.environ["REPO"])

import numpy as np
import jax.numpy as jnp
from transeditor_tpu.config import ModelConfig, TrainConfig
from transeditor_tpu.parallel import create_mesh, multihost
from transeditor_tpu.parallel.multihost import global_batch
from transeditor_tpu.train.gan import init_state, make_train_step

if "NUM_PROCESSES" in os.environ:
    assert multihost.initialize()
    rank = multihost.process_index()
else:
    rank = 0
assert len(jax.devices()) == 4

cfg = ModelConfig(size=16, style_dim=32, param_dim=32, max_channels=32,
                  n_trans=1)
tcfg = TrainConfig(batch_size=8, r1_gamma=10.0)
state = init_state(cfg, tcfg, jax.random.PRNGKey(0))  # same on all hosts
step = make_train_step(cfg, tcfg)

mesh = create_mesh(n_data=4, n_model=1)
full = np.random.RandomState(1).randn(8, 16, 16, 3).astype(np.float32)
per_host = 8 // max(1, multihost.process_count())
local = full[rank * per_host:(rank + 1) * per_host]
real = global_batch(mesh, local)
assert real.shape == (8, 16, 16, 3)

new_state, m = step(state, real, jax.random.PRNGKey(2),
                    do_d_reg=True, do_g_reg=True)
out = {k: float(v) for k, v in m.items()}
out["mean_path_length"] = float(new_state.mean_path_length)
if rank == 0:
    with open(os.environ["OUT"], "w") as f:
        json.dump(out, f)
multihost.synchronize("train-done")
print(f"TRAINOK rank={rank}")
"""


@pytest.mark.slow
def test_two_process_train_step_parity(tmp_path):
    """SURVEY hard-part #1 across a REAL process boundary: the full
    train step with BOTH second-order regularizers (R1 + path) on a
    2-process x 2-device mesh must match the single-process 4-device
    run on identical state/batch/rng (the psum-under-grad-of-grad
    placement is exactly what differs if the sharding is wrong)."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_out = str(tmp_path / "ref.json")
    dist_out = str(tmp_path / "dist.json")

    def base_env(**extra):
        env = dict(os.environ, REPO=repo, JAX_PLATFORMS="cpu", **extra)
        env.pop("PYTHONPATH", None)
        return env

    # single-process 4-device reference (run serially: one CPU core)
    p = subprocess.run(
        [sys.executable, "-c", TRAIN_WORKER],
        env=base_env(LOCAL_DEVICES="4", OUT=ref_out),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=1200)
    assert p.returncode == 0, f"reference run failed:\n{p.stdout}"

    port = _free_port()
    procs = []
    for rank in range(2):
        env = base_env(
            LOCAL_DEVICES="2", OUT=dist_out,
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2", PROCESS_ID=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", TRAIN_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"TRAINOK rank={rank}" in out, out

    with open(ref_out) as f:
        want = json.load(f)
    with open(dist_out) as f:
        got = json.load(f)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 5e-3 + 5e-3 * abs(want[k]), (
            k, got[k], want[k])


@pytest.mark.slow
def test_two_process_multihost(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            REPO=repo,
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(rank),
            JAX_PLATFORMS="cpu",
        )
        # a clean PYTHONPATH keeps the axon sitecustomize from
        # grabbing the TPU inside the workers
        env.pop("PYTHONPATH", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank}" in out, out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
