from video_prediction_tpu.parallel.distributed import maybe_initialize, per_host_batch  # noqa: F401
from video_prediction_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_for_batch,
    batch_sharding,
    batch_shardings,
    leaf_spec,
    replicated_sharding,
    shard_batch,
    spatial_mesh,
)
