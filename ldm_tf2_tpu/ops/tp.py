"""Tensor-parallel x Pallas-kernel composition (VERDICT r3 next #2).

GSPMD partitions plain HLO (dots, convs) automatically from the param
shardings in `parallel/sharding.py`, but a Pallas custom call is opaque
to the partitioner — under a ``model`` mesh axis the flash-attention and
fused-FFN kernels would force their operands replicated (all-gather) and
compute redundantly on every model shard.  Until round 4 the framework
therefore silently fell back to unfused HLO whenever TP was enabled,
making its two flagship features mutually exclusive.

This module composes them explicitly: `enable_tensor_parallel(mesh)`
registers the mesh, and the model layer routes the kernel call sites
through `jax.shard_map` wrappers whose per-shard bodies invoke the SAME
Pallas kernels on the local shard:

  * flash self-attention:  q/k/v arrive head-sharded from the TP'd split
    projections ([B, T, H*Sp] flat layout, heads blocked along the minor
    dim — a model-axis shard is exactly H/n whole heads).  Attention is
    head-independent, so each shard runs the unmodified flash kernel on
    its heads; zero collectives (the merge projection's row-parallel
    psum happens outside, inserted by GSPMD as usual).
  * packed cross-attention: identical head decomposition
    (ops/cross_attention.py single-block kernel).
  * fused FFN: Megatron column x row decomposition.  Each shard runs the
    LN+GEGLU+output-dot kernel over its F/n hidden columns with the
    residual add and output bias disabled (`residual=False`, zero b2),
    then one psum reduces the row-parallel partial outputs and the
    bias + residual are applied once.

Claim predicates mirror the single-device dispatch gates plus the
divisibility the decomposition needs (heads % n, hidden-columns % n with
the 128-lane tile constraint).  When a predicate declines, the model
falls back to the unfused XLA math — which GSPMD partitions natively —
never to a replicated Pallas call.

The ResBlock GN+SiLU+conv chain needs no wrapper by design: its
best-measured formulation IS plain HLO (the conv emitter / 9-shifted
dots — the whole-chain Pallas conv kernel measured SLOWER and is opt-in
only, ops/fused_conv.py), and plain HLO partitions natively under the
column->row conv rules in parallel/sharding.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# (mesh, axis) when a >1-sized model axis is registered, else None.
_TP_STATE: tuple[Mesh, str] | None = None


def enable_tensor_parallel(mesh: Mesh | None, axis: str = "model") -> None:
    """Register `mesh` for TP kernel composition (None or a size-1 axis
    disables).  Call alongside `shard_params_tp`."""
    global _TP_STATE
    if mesh is None or mesh.shape.get(axis, 1) <= 1:
        _TP_STATE = None
    else:
        _TP_STATE = (mesh, axis)


def tp_state() -> tuple[Mesh, str] | None:
    return _TP_STATE


def _tp_size() -> int:
    if _TP_STATE is None:
        return 1
    mesh, axis = _TP_STATE
    return mesh.shape[axis]


def _batch_spec():
    """Partition entry for the batch dim: all non-model mesh axes (the
    data axes), so batch stays data-sharded inside the wrapper."""
    mesh, axis = _TP_STATE
    other = tuple(a for a in mesh.axis_names if a != axis)
    return other if other else None


def _data_size() -> int:
    mesh, axis = _TP_STATE
    out = 1
    for a in mesh.axis_names:
        if a != axis:
            out *= mesh.shape[a]
    return out


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def tp_attention_claims(num_heads: int, batch: int | None = None) -> bool:
    """True when head-sharded kernel attention decomposes over the model
    axis: heads divide the axis (each shard gets whole heads) and the
    batch divides the data axes (shard_map needs even batch shards)."""
    if _TP_STATE is None:
        return False
    if num_heads % _tp_size() != 0:
        return False
    if batch is not None and batch % _data_size() != 0:
        return False
    return True


def tp_flash_attention_flat(q, k, v, scale, num_heads: int):
    """Head-sharded flash attention on the flat packed layout.

    q/k/v: [B, T, H*Sp] with heads blocked along the minor dim; the
    model-axis shard of that dim is (H/n) whole heads, on which the
    unmodified kernel runs locally.  No collective: output stays
    head-sharded for the row-parallel merge projection."""
    from ldm_tf2_tpu.ops.flash_attention import flash_attention_flat

    mesh, axis = _TP_STATE
    n = mesh.shape[axis]
    spec = P(_batch_spec(), None, axis)

    def body(q, k, v):
        # nondiff args (scale, heads) passed positionally: custom_vjp
        return flash_attention_flat(q, k, v, scale, num_heads // n)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,  # Pallas calls don't annotate varying mesh axes
    )
    return fn(q, k, v)


def tp_flash_attention(q, k, v, scale):
    """Head-sharded flash attention on the generic [B, T, H, S] layout
    (the non-packed dispatch, ops/attention.py::_local_attention)."""
    from ldm_tf2_tpu.ops.flash_attention import flash_attention

    mesh, axis = _TP_STATE
    spec = P(_batch_spec(), None, axis, None)

    def body(q, k, v):
        return flash_attention(q, k, v, scale)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,  # Pallas calls don't annotate varying mesh axes
    )
    return fn(q, k, v)


def tp_cross_attention_flat(q, k, v, scale, num_heads: int):
    """Head-sharded packed cross-attention (short-kv single-block
    kernel); same decomposition as `tp_flash_attention_flat`."""
    from ldm_tf2_tpu.ops.cross_attention import cross_attention_flat

    mesh, axis = _TP_STATE
    n = mesh.shape[axis]
    spec = P(_batch_spec(), None, axis)

    def body(q, k, v):
        return cross_attention_flat(q, k, v, scale, num_heads // n)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,  # Pallas calls don't annotate varying mesh axes
    )
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# fused FFN
# ---------------------------------------------------------------------------


def tp_ffn_claims(
    b: int, t: int, d: int, hidden: int | None = None,
    on_tpu: bool | None = None,
) -> bool:
    """True when the column x row fused-FFN decomposition claims: the
    single-device gates (impl switch, d<=640 policy, M tiling on the
    LOCAL batch) plus per-shard hidden columns that still tile the
    128-lane minor dim.

    ``hidden`` is FeedForward's actual width (channels * multiplier);
    pass it so a non-default multiplier validates the real shard width
    the kernel will see (ADVICE r4) — None falls back to the 4*d
    default."""
    from ldm_tf2_tpu.ops import fused_ffn as ff

    if _TP_STATE is None:
        return False
    n = _tp_size()
    if hidden is None:
        hidden = 4 * d
    if hidden % n != 0 or (hidden // n) % 128 != 0:
        return False
    if ff.get_fused_ffn_impl() == "xla":
        return False
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if ff.get_fused_ffn_impl() == "auto" and not on_tpu:
        return False
    if ff.get_fused_ffn_impl() == "auto" and d > 640:
        return False
    if b % _data_size() != 0:
        return False
    m_local = (b // _data_size()) * t
    return ff._pick_tiles(m_local, d) is not None


def tp_fused_ffn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2,
                 eps: float = 1e-5):
    """Megatron column x row fused FFN under shard_map.

    Each shard runs the Pallas LN+GEGLU+dense kernel over its F/n hidden
    columns (residual/bias disabled so the psum does not multiply them),
    then the row-parallel partials reduce once and bias + residual apply
    on the reduced value — exactly the single-device math."""
    from ldm_tf2_tpu.ops import fused_ffn as ff

    mesh, axis = _TP_STATE
    col, colb, row = P(None, axis), P(axis), P(axis, None)
    rep = P()
    xspec = P(_batch_spec(), None, None)

    def body(x, lns, lnb, wv, bv, wg, bg, w2, b2):
        local = ff._pallas_ffn(
            x, lns, lnb, wv, bv, wg, bg, w2,
            jnp.zeros_like(b2), eps, residual=False,
        )
        out = jax.lax.psum(local, axis)
        return out + b2.astype(out.dtype) + x.astype(out.dtype)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(xspec, rep, rep, col, colb, col, colb, row, rep),
        out_specs=xspec,
        check_vma=False,  # Pallas calls don't annotate varying mesh axes
    )
    return fn(x, ln_scale, ln_bias, w1v, b1v, w1g, b1g, w2, b2)
