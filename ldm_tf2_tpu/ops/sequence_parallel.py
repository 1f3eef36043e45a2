"""Sequence-parallel (Ulysses-style) attention over a mesh axis.

SURVEY.md §2.4/§5 lists head-sharded sequence parallelism as the documented
escape hatch for spatial self-attention beyond one chip's comfort zone
(16384+ tokens at 1024x1024 sampling; the reference caps out at 4096 tokens
and has no parallelism at all).  This module provides it as a first-class
op:

* tokens arrive sharded over the mesh axis ([B, T/P, H, S] per device);
* one ``all_to_all`` re-shards heads instead of tokens ([B, T, H/P, S]) so
  every device runs *full-sequence* attention on a subset of heads — the
  attention math itself needs no communication;
* a second ``all_to_all`` restores token sharding for the (sequence-
  sharded) projections/FFN that follow.

Per layer this costs two all-to-alls of the activation size over ICI —
the Ulysses pattern (Jacobs et al. 2023) — vs. ring attention's P-step
KV rotation; for the moderate sequence lengths of this model family the
two-collective form is the right trade.

Requires num_heads % P == 0 (the AE's single-head attention cannot be
head-sharded; shard the batch instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ldm_tf2_tpu.ops.attention import _local_attention


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    axis_name: str = "model",
) -> jnp.ndarray:
    """Attention on sequence-sharded inputs, inside shard_map.

    Args:
      q: [B, Tq/P, H, S] local shard; k/v: [B, Tkv/P, H, S].
      axis_name: mesh axis of size P over which the sequence is sharded.
    Returns:
      [B, Tq/P, H, S] local shard of the attention output.
    """
    # scatter heads (axis 2), gather sequence (axis 1)
    qh = jax.lax.all_to_all(q, axis_name, 2, 1, tiled=True)
    kh = jax.lax.all_to_all(k, axis_name, 2, 1, tiled=True)
    vh = jax.lax.all_to_all(v, axis_name, 2, 1, tiled=True)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # The *local* dispatch, not dot_product_attention: the global SP
    # dispatch must not re-trigger inside the shard_map body.
    out = _local_attention(qh, kh, vh, scale)
    # scatter sequence (axis 1), gather heads (axis 2)
    return jax.lax.all_to_all(out, axis_name, 1, 2, tiled=True)


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    scale: float | None = None,
    axis: str = "model",
) -> jnp.ndarray:
    """Global-view wrapper: shard q/k/v over ``axis`` along the token dim,
    run ulysses_attention under shard_map, return the (sequence-sharded)
    global result.

    q: [B, Tq, H, S], k/v: [B, Tkv, H, S]; requires H % mesh.shape[axis]
    == 0 and Tq/Tkv % mesh.shape[axis] == 0.
    """
    p = mesh.shape[axis]
    h = q.shape[2]
    if h % p != 0:
        raise ValueError(
            f"num_heads {h} not divisible by mesh axis {axis!r} size {p}"
        )
    if q.shape[1] % p != 0 or k.shape[1] % p != 0:
        raise ValueError(
            f"sequence lengths {q.shape[1]}/{k.shape[1]} not divisible by "
            f"mesh axis {axis!r} size {p}"
        )
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(
            ulysses_attention, scale=scale, axis_name=axis
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
