from animal2vec_tpu.parallel.mesh import (
    build_mesh,
    batch_sharding,
    param_sharding,
    param_partition_spec,
    replicated,
)
from animal2vec_tpu.parallel.pipeline import (
    active_mesh,
    pick_microbatches,
    pipeline_blocks,
)
from animal2vec_tpu.parallel.serving import DataParallelServing
