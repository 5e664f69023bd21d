from mmtrs_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_jit,
    pad_to_multiple,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_jit",
    "pad_to_multiple",
]
