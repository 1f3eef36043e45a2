"""Device mesh + sharding helpers.

Scaling recipe (How to Scale Your Model): pick a mesh, annotate shardings on
the arguments, let XLA insert the collectives.  For this model family the
primary axis is ``data`` (batch); a second ``model`` axis is reserved for
tensor-parallel sharding of attention heads / conv channels on the 0.87B
U-Net (SURVEY.md §2.4 "Tensor parallel: optional phase-2").

Gradients are all-reduced over ICI implicitly by jit: batch sharded on
``data`` + replicated params means XLA emits the psum for us.

Multi-host: call `jax.distributed.initialize()` (via
`maybe_initialize_distributed`) before creating the mesh; the mesh then
spans all processes and the data loader shards per process.
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> None:
    """Initialize JAX's multi-host runtime when launched under a cluster
    (no-op single-process; the reference has no multi-host story at all).

    Also honors ``JAX_PLATFORMS=cpu`` explicitly: some TPU plugins
    (e.g. the axon sitecustomize) force-select their platform even when
    the env var is exported, so a CLI launched for a CPU run would
    silently grab the TPU.  Called first in every CLI main — before any
    backend-initializing jax call — so the override lands in time."""
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def create_mesh(
    mesh_shape: Mapping[str, int] | None = None,
    devices: Sequence[Any] | None = None,
) -> Mesh:
    """Create a named mesh.  Default: all devices on the ``data`` axis.

    mesh_shape maps axis name -> size, e.g. {"data": 4, "model": 2}; sizes
    must multiply to the device count (-1 allowed once to infer).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = {DATA_AXIS: len(devices)}
    names = tuple(mesh_shape.keys())
    sizes = list(mesh_shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh shape {dict(zip(names, sizes))} != {len(devices)} devices"
        )
    return Mesh(devices.reshape(sizes), names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """NamedSharding that splits axis 0 (batch) across the data axis.

    Rank-0 leaves (per-batch scalars) have no batch axis to split and
    replicate instead — P(DATA_AXIS) on a 0-d array is an error."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Multi-host: each process passes its own slice of the global batch (the
    loaders' shard_index/shard_count yield exactly that) and the slices are
    assembled into one global sharded array."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(x)), np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh (params, etc.)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
