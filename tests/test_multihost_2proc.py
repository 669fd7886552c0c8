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
