from animal2vec_tpu.parallel.mesh import (
    build_mesh,
    batch_sharding,
    param_sharding,
    param_partition_spec,
    replicated,
)
