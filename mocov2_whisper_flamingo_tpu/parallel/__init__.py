"""SPMD parallelism: mesh construction and sharding rules.

Replaces the reference's DDP/NCCL stack (reference: train.py:319 —
``DDPStrategy(find_unused_parameters=True)``; datamodule/data_module.py:84-106
DistributedSamplerWrapper) with the TPU-native story: one
``jax.sharding.Mesh`` with ("data", "model") axes, NamedSharding annotations,
and XLA-emitted collectives over ICI (psum for grad reduction, all_gather for
TP activations).
"""

from mocov2_whisper_flamingo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_sharding,
    shard_params,
    shard_batch,
    put_host_local_batch,
    initialize_distributed,
    replicated,
)
