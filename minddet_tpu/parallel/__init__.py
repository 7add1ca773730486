from minddet_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    create_mesh,
    get_default_mesh,
    replicated,
    set_default_mesh,
    shard_batch,
    shard_params,
)
