"""Device-mesh parallelism layer (SURVEY.md §2 parallelism inventory).

The reference is single-device; this layer is the TPU-native addition: a
``jax.sharding.Mesh`` over ('data', 'model'), batch-sharded inputs, replicated
parameters, and jit-compiled steps whose gradient all-reduce XLA lowers onto
ICI. Tensor parallelism is a sharding-spec change on the reserved 'model'
axis, not a rewrite."""

from tpudet.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
