"""Multi-host (multi-process) launch plumbing.

The reference launches one process per GPU via ``torch.distributed.launch``
and NCCL ``init_process_group('env://')`` (``train_spatial_query.py:425-428``,
``README.md:45-49``).  The JAX analogue is one process per HOST:
``jax.distributed.initialize`` wires the coordination service, after which
``jax.devices()`` spans every chip in the slice and a single global
``Mesh`` covers them — collectives ride ICI within a slice and DCN across
slices with no further code.

Everything degrades to a no-op in the single-process case, so the same
training entry point serves both.

Env protocol (set by the pod launcher; all optional on Cloud TPU where
JAX auto-detects):
  * ``COORDINATOR_ADDRESS`` — host:port of process 0
  * ``NUM_PROCESSES``       — world size
  * ``PROCESS_ID``          — this process's rank
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               warmup: bool = True) -> bool:
    """``jax.distributed.initialize`` from args or env; returns True if a
    multi-process runtime was initialized (the reference's WORLD_SIZE>1
    trigger, train_spatial_query.py:422-428).

    ``warmup=True`` then runs :func:`warmup_collectives` — see there for
    why the first cross-process collective must NOT be the first big
    compiled program.
    """
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _env_int("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int(
        "PROCESS_ID")
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    if warmup:
        warmup_collectives()
    return True


def warmup_collectives() -> None:
    """Run one tiny all-reduce over every global device, and verify it.

    Two jobs:
      * **Rendezvous de-skew.**  The backend's cross-process collective
        context (Gloo on CPU, the ICI launch groups on TPU) is created
        lazily inside the FIRST executed collective, with a fixed
        connection deadline (Gloo's KV-store lookups give up after
        30 s).  If that first collective sits inside the first big
        compiled program, per-host compile-time skew counts against
        the deadline — observed as ``Gloo context initialization
        failed: DEADLINE_EXCEEDED: GetKeyValue() timed out`` on an
        oversubscribed host whose peer was still compiling the train
        step.  Running a trivial psum here, while all hosts are still
        in lockstep from ``jax.distributed.initialize``'s own barrier,
        creates (and caches) the context when the skew is milliseconds.
      * **Fail-fast connectivity probe.**  A dead ICI link / mis-wired
        coordinator surfaces now, as a checked error with a clear
        message, instead of minutes later under the first train step.
    """
    devs = np.asarray(jax.devices()).reshape(-1)
    if devs.size <= 1:
        return
    mesh = Mesh(devs, ("all",))
    local = np.ones((len(jax.local_devices()),), np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("all")), local)
    total = float(np.asarray(jax.jit(lambda a: a.sum())(x)))
    if abs(total - devs.size) > 0.5:
        raise RuntimeError(
            f"collective warm-up all-reduce returned {total}, expected "
            f"{devs.size} — cross-process device fabric is unhealthy")


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v not in (None, "") else None


def process_index() -> int:
    """This host's rank (the reference get_rank(),
    utils/distributed.py:7-13)."""
    return jax.process_index()


def process_count() -> int:
    """World size in hosts (the reference get_world_size(),
    utils/distributed.py:32-39)."""
    return jax.process_count()


def is_main() -> bool:
    """rank-0 gate for logging/sampling (reference ``get_rank() == 0``)."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """Per-host slice of the global batch (the DistributedSampler
    analogue: each host loads 1/world_size of every global batch)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n


def global_batch(mesh: Mesh, local: np.ndarray) -> jax.Array:
    """Assemble a data-sharded GLOBAL array from this host's local batch.

    Single-process: equivalent to ``device_put`` with a 'data' sharding.
    Multi-process: each host contributes its shard; no host ever
    materializes the global batch (``jax.make_array_from_process_local_data``
    is the host-sharded input path for pjit-style programs).
    """
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))


# -- the reference's utils/distributed.py helper surface ----------------
#
# In the reference these are explicit NCCL calls; here the training hot
# path never needs them (XLA inserts the collectives from shardings),
# so they exist for host-side orchestration: eval fan-outs that gather
# per-host results, barriers around checkpoint IO, seeding.

def synchronize(name: str = "barrier") -> None:
    """Cross-host barrier (reference ``synchronize()``,
    utils/distributed.py:17-29).  No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_gather_host(data):
    """Gather an arbitrary pytree of arrays from every host; returns
    stacked-per-leaf values with a leading process axis (the reference's
    pickle ``all_gather``, utils/distributed.py:67-99).  Single-process:
    adds the length-1 leading axis."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(x)[None], data)
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(data)


def reduce_loss_dict(metrics: dict) -> dict:
    """Mean of each scalar across hosts (the reference's
    ``reduce_loss_dict``, utils/distributed.py:102-124, which reduces to
    rank 0 and divides by world size — here every host gets the mean)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    gathered = all_gather_host(
        {k: np.asarray(float(v), np.float32) for k, v in metrics.items()})
    return {k: float(np.mean(v)) for k, v in gathered.items()}


def any_flag(flag: bool, name: str = "stop") -> bool:
    """Cross-host OR of a local boolean.

    Preemption agreement: SIGTERM delivery is per-process and
    unsynchronized, so a train loop must never act on a local flag
    alone — one host breaking out while its peers are already inside
    the next step's collectives deadlocks both the step and the
    coordinated checkpoint save.  Every host calls this at the same
    point each iteration; all of them observe True at the same step.
    Single-process: free (no collective)."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(np.max(multihost_utils.process_allgather(
        np.asarray(bool(flag), np.int32))))


def broadcast_from_main(data):
    """Host-0's value everywhere (used for shared seeds / sampled
    boundaries; the ``dist.broadcast`` analogue)."""
    if jax.process_count() == 1:
        return data
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(data)
