from lsfa_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
)
