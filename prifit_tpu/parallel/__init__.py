from prifit_tpu.parallel.mesh import (
    maybe_initialize_distributed,
    make_mesh,
    make_data_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)

__all__ = ["maybe_initialize_distributed", "make_mesh", "make_data_mesh", "shard_batch", "replicate",
           "batch_sharding"]
