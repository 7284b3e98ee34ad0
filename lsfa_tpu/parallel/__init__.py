from lsfa_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    make_tp_mesh,
    replicate,
    shard_batch,
    shard_params,
    tensor_parallel_specs,
)
