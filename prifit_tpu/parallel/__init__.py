from prifit_tpu.parallel.mesh import (
    make_mesh,
    make_data_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)

__all__ = ["make_mesh", "make_data_mesh", "shard_batch", "replicate",
           "batch_sharding"]
