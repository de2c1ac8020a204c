"""Scaling layer: device meshes, shardings, distributed train steps."""

from rnr_tpu.parallel.sharding import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_rnr_batch,
    make_sharded_rnr_train_step,
    make_sharded_dnr_train_step,
    make_sharded_rnr_eval_step,
)
from rnr_tpu.parallel.constraints import constrain
from rnr_tpu.parallel.distributed import (
    init_distributed,
    is_main_process,
    fetch_global,
    host_local_batch_slice,
)
