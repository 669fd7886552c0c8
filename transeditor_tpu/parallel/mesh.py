"""Device-mesh parallelism.

The reference's only strategy is NCCL data-parallel (DDP +
DistributedSampler + loss-dict reduce, ``utils/distributed.py:7-124``,
``train_spatial_query.py:425-428,494-525``).  The TPU-native equivalent
needs no process-group plumbing at all: we build a
``jax.sharding.Mesh``, annotate array shardings, and XLA inserts the
ICI collectives (psum for gradient reduction, all-gather where a
tensor-sharded weight feeds a replicated consumer).

Axes:
  * ``data``  — batch sharding (the DDP analogue).
  * ``model`` — tensor parallelism over large channel dimensions
    (output-channel sharding of conv/linear weights); useful for
    scale-out batch-16-per-chip training and giant sampling sweeps.

The rules are honest about this model's scaling regime (SURVEY.md §2.9:
the scaling dimension is batch): ``data`` carries the parallel work,
``model`` shards optimizer/parameter state and the widest matmuls.

``fsdp=True`` additionally shards each large parameter (and, applied to
the optimizer-state tree, its Adam moments) over ``data`` — the
ZeRO/FSDP analogue.  No wrapper machinery is needed: under ``jit``,
GSPMD all-gathers a data-sharded weight at its use site and turns the
gradient ``psum`` into a reduce-scatter, so per-chip parameter +
optimizer memory drops by ~n_data while the step function is unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: Optional[int] = None, n_model: int = 1,
                devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} > {len(devices)} devices")
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def param_partition_spec(path: tuple, leaf, mesh: Mesh,
                         min_size: int = 256, fsdp: bool = False) -> P:
    """Tensor-parallel rule: shard the output-channel (last) axis of
    large kernels over 'model'; replicate everything else.

    Keeps biases / small tensors / modulation layers replicated so the
    per-sample style path stays local; the wide conv / linear weights
    (the memory and FLOP bulk) split across the model axis.

    With ``fsdp=True`` the largest remaining eligible axis of a large
    tensor is additionally sharded over 'data' (ZeRO/FSDP-style fully
    sharded parameter + optimizer state; the rule depends only on the
    leaf's shape, so it applies unchanged to Adam moment trees).
    """
    n_model = mesh.shape["model"]
    shape = tuple(getattr(leaf, "shape", ()))
    spec = [None] * len(shape)
    if (n_model > 1 and len(shape) >= 2 and shape[-1] >= min_size
            and shape[-1] % n_model == 0):
        spec[-1] = "model"
    n_data = mesh.shape["data"]
    if fsdp and n_data > 1 and len(shape) >= 2:
        for ax in sorted(range(len(shape)), key=lambda a: -shape[a]):
            if (spec[ax] is None and shape[ax] >= min_size
                    and shape[ax] % n_data == 0):
                spec[ax] = "data"
                break
    return P(*spec)


def shard_params(params, mesh: Mesh, min_size: int = 256,
                 fsdp: bool = False):
    """Place a param tree on the mesh per ``param_partition_spec``."""
    def place(path, leaf):
        spec = param_partition_spec(path, leaf, mesh, min_size, fsdp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh, min_size: int = 256,
                    fsdp: bool = False):
    """The NamedSharding tree matching ``shard_params`` (for jit
    in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_partition_spec(path, leaf, mesh, min_size, fsdp)),
        params)


def shard_batch(x, mesh: Mesh):
    """Shard leading (batch) axis over 'data'; replicate the rest."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))), x)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
