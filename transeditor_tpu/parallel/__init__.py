from transeditor_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    shard_params,
    param_partition_spec,
)
from transeditor_tpu.parallel import multihost
