from lav_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_hybrid_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
