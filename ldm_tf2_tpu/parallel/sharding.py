"""Tensor-parallel parameter sharding rules (GSPMD, zero model changes).

DP replicates every weight; at U-Net/transformer scale (0.87B + 0.54B f32)
that's ~5.6GB per chip of weights alone.  Sharding the attention heads and
FFN hidden dims over a ``model`` mesh axis splits both the weights and the
corresponding matmuls; XLA's SPMD partitioner propagates the shardings
through the network and inserts the (ICI-resident) collectives where the
partitioned dims contract away.  This is Megatron-style TP expressed purely
as placement: `device_put` params with these shardings and jit the SAME
step function.

Rules are (path-regex -> PartitionSpec) resolved against '/'-joined param
paths; the first match wins, default replicate.  The head axes chosen:

  split projections  [D, H, S]   -> shard H (axis 1)
  merge projections  [H, S, D]   -> shard H (axis 0)
  FFN filter / GEGLU [D, F]      -> shard F (axis 1, column-parallel)
  FFN output         [F, D]      -> shard F (axis 0, row-parallel)
  conv kernels [kh, kw, I, O]    -> shard O (axis 3) on wide channels
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm_tf2_tpu.parallel.mesh import MODEL_AXIS

# (regex over '/'-joined path, partition spec builder over the model axis)
DEFAULT_TP_RULES: Sequence[tuple[str, P]] = (
    # attention head-split projections: [D, H, S]
    (r"(mha|att_layer\d)/(query|key|value)/kernel$", P(None, MODEL_AXIS, None)),
    # attention merge projections: [H, S, D]
    (r"(mha|att_layer\d)/output/kernel$", P(MODEL_AXIS, None, None)),
    # transformer FFN: column-parallel in, row-parallel out
    (r"ffn/filter/kernel$", P(None, MODEL_AXIS)),
    (r"ffn/filter/bias$", P(MODEL_AXIS)),
    (r"ffn/output/kernel$", P(MODEL_AXIS, None)),
    # U-Net GEGLU feed-forward: separate value/gate leaves (models/unet.py
    # GEGLU) column-shard cleanly — the v*gelu(g) product is elementwise
    # on co-sharded halves, so no collective until the row-parallel output
    # dense (true Megatron column parallelism; the round-2 fused-leaf
    # layout forced a GSPMD reshard mid-FFN).
    (r"ffn/geglu/(value|gate)/kernel$", P(None, MODEL_AXIS)),
    (r"ffn/geglu/(value|gate)/bias$", P(MODEL_AXIS)),
    (r"ffn/dense/kernel$", P(MODEL_AXIS, None)),
    # U-Net ResBlock convolutions (the FLOPs majority, SURVEY §2.1):
    # Megatron-style column->row over the two 3x3 convs.  conv2d_1
    # output-channel-sharded [3,3,I,O/n]; the time-emb projection and
    # GN2 affine shard the same channel axis so the inter-conv
    # activations stay sharded (GroupNorm stats are group-local: 32
    # groups split contiguously, so any model axis dividing 32 keeps
    # stats shard-local); conv2d_2 input-channel-sharded [3,3,I/n,O]
    # contracts the sharded axis away -> one psum at the block boundary.
    # NOTE the divisibility guard in tp_param_shardings replicates tiny
    # test configs automatically.  Pallas kernels COMPOSE with these
    # rules via the ops/tp.py shard_map wrappers (flash attention by
    # head, fused FFN column x row) — enable_tensor_parallel(mesh)
    # activates them; see that module's docstring.  The conv chain needs
    # no wrapper: its best-measured formulation is plain HLO (emitter /
    # 9-shifted dots), which GSPMD partitions natively under these
    # column->row rules.
    (r"residual/conv2d_1/kernel$", P(None, None, None, MODEL_AXIS)),
    (r"residual/conv2d_1/bias$", P(MODEL_AXIS)),
    (r"residual/dense/kernel$", P(None, MODEL_AXIS)),
    (r"residual/dense/bias$", P(MODEL_AXIS)),
    (r"residual/group_norm_2/(scale|bias)$", P(MODEL_AXIS)),
    (r"residual/conv2d_2/kernel$", P(None, None, MODEL_AXIS, None)),
    # token embedding: shard vocab (gathered once per step)
    (r"token_embedding/embedding$", P(MODEL_AXIS, None)),
)


def tp_param_shardings(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """Pytree of NamedShardings for `params` under the TP rules.

    Leaves whose matched dimension does not divide the model-axis size fall
    back to replication (e.g. tiny test configs).
    """
    model_size = mesh.shape.get(MODEL_AXIS, 1)

    def part(k):
        for attr in ("key", "name", "idx"):
            if hasattr(k, attr):
                return str(getattr(k, attr))
        return str(k)

    def resolve(path, leaf):
        name = "/".join(part(k) for k in path)
        if model_size > 1:
            for pattern, spec in rules:
                if re.search(pattern, name):
                    # check divisibility of the sharded dim
                    ok = True
                    for dim, axis in enumerate(spec):
                        if axis is not None and (
                            dim >= leaf.ndim
                            or leaf.shape[dim] % model_size != 0
                        ):
                            ok = False
                    if ok:
                        return NamedSharding(mesh, spec)
                    break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(resolve, params)


def shard_params_tp(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """device_put `params` with TP shardings (replicated where no rule)."""
    shardings = tp_param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)
