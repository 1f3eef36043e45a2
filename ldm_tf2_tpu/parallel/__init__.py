"""Mesh construction and sharding policy (the layer the reference lacks).

The reference is single-process, single-device (SURVEY.md §2.4: no
tf.distribute anywhere; LDM training is even CPU-pinned,
run_ldm_trainer.py:25).  Here parallelism is first-class: a
`jax.sharding.Mesh` with named axes, NamedSharding annotations on batches
and params, and XLA-emitted collectives over ICI/DCN.
"""

from ldm_tf2_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    maybe_initialize_distributed,
    replicate,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "maybe_initialize_distributed",
    "replicate",
    "shard_batch",
]
