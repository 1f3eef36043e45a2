"""Multi-head dot-product attention for TPU.

Layout contract (matches the reference's einsum convention,
/root/reference/unet.py:280-287 and transformer.py:107-116):
  q: [B, Q, H, S]   k, v: [B, C, H, S]   out: [B, Q, H, S]
with logits scaled by ``S ** -0.5`` *after* the QK contraction.

Two interchangeable implementations:

* ``"xla"`` — einsum + softmax; XLA fuses the scale/softmax chain and tiles
  the two batched matmuls onto the MXU.  Preferred for the short sequences
  in this model family (cross-attention kv length 77).
* ``"flash"`` — a Pallas blockwise online-softmax kernel
  (`ldm_tf2_tpu.ops.flash_attention`) that never materializes the [Q, C]
  logits matrix in HBM.  Preferred for long self-attention sequences
  (4096 spatial tokens at 512x512 sampling; 16384 at 1024x1024).

The active implementation is process-global state set by
``set_attention_impl``; "auto" picks flash for long sequences on TPU.

A third dispatch layer sits above both: ``enable_sequence_parallel(mesh)``
routes sufficiently long self-attention through the Ulysses head-sharded
sequence-parallel op (`ldm_tf2_tpu.ops.sequence_parallel`) over the mesh's
``model`` axis — the documented escape hatch for 1024x1024+ sampling
(SURVEY.md §5).  Cross-attention (kv length 77) and short spatial levels
fall through to the local path automatically via the divisibility and
length guards.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

_ATTENTION_IMPL = "auto"

# Below this q-sequence length the XLA path wins (kernel launch + padding
# overheads dominate); above it the flash kernel's HBM savings win.
_FLASH_MIN_SEQ_LEN = 1024

# Sequence-parallel dispatch state: (mesh, axis, min_seq_len) or None.
_SP_STATE = None


def set_attention_impl(impl: str) -> None:
    """Select the attention implementation: "xla", "flash", or "auto"."""
    global _ATTENTION_IMPL
    if impl not in ("xla", "flash", "auto"):
        raise ValueError(f"unknown attention impl: {impl!r}")
    _ATTENTION_IMPL = impl


def get_attention_impl() -> str:
    return _ATTENTION_IMPL


def _xla_attention(q, k, v, scale):
    # [B, H, Q, C] logits; contraction in f32 on the MXU regardless of the
    # activation dtype (preferred_element_type) to keep softmax numerics
    # stable in bf16 runs.
    logits = jnp.einsum(
        "bqhs,bchs->bhqc", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqc,bchs->bqhs", weights, v)


def _use_flash(q_len: int, kv_len: int) -> bool:
    if _ATTENTION_IMPL == "flash":
        return True
    if _ATTENTION_IMPL == "xla":
        return False
    on_tpu = jax.default_backend() == "tpu"
    return on_tpu and q_len >= _FLASH_MIN_SEQ_LEN and kv_len >= _FLASH_MIN_SEQ_LEN


def enable_sequence_parallel(
    mesh, axis: str = "model", min_seq_len: int = 4096
) -> None:
    """Route long self-attention through Ulysses SP over ``mesh[axis]``.

    Attention calls whose q/kv lengths and head count are divisible by the
    axis size and whose sequence is >= min_seq_len are computed with tokens
    sharded over the axis (two all_to_alls per call); everything else stays
    local.  No-op dispatch when the axis has size 1.
    """
    global _SP_STATE
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r}: {dict(mesh.shape)}")
    _SP_STATE = (mesh, axis, min_seq_len) if mesh.shape[axis] > 1 else None


def disable_sequence_parallel() -> None:
    global _SP_STATE
    _SP_STATE = None


def _local_attention(q, k, v, scale):
    """The single-device dispatch (xla vs flash kernel)."""
    if _use_flash(q.shape[1], k.shape[1]):
        from ldm_tf2_tpu.ops.tp import (
            tp_attention_claims,
            tp_flash_attention,
            tp_state,
        )

        if tp_state() is not None:
            # A bare Pallas call is opaque to GSPMD — under a model axis
            # it would be computed replicated.  Decompose by head when
            # the counts divide (ops/tp.py), else XLA math (partitions
            # natively).
            if tp_attention_claims(q.shape[2], q.shape[0]):
                return tp_flash_attention(q, k, v, scale)
            return _xla_attention(q, k, v, scale)
        from ldm_tf2_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


def _sp_claims(q_len: int, kv_len: int, num_heads: int) -> bool:
    """Single source of truth for "SP owns this attention shape": a
    sufficiently long sequence whose q/kv lengths and head count divide the
    mesh axis.  Shared by the dispatch (`_use_sequence_parallel`) and the
    layout predicate (`use_packed_flash`) so they cannot drift."""
    if _SP_STATE is None:
        return False
    mesh, axis, min_seq_len = _SP_STATE
    p = mesh.shape[axis]
    return (
        q_len >= min_seq_len
        and num_heads % p == 0
        and q_len % p == 0
        and kv_len % p == 0
    )


def _use_sequence_parallel(q, k) -> bool:
    return _sp_claims(q.shape[1], k.shape[1], q.shape[2])


_PACKED_ENABLED = True
# Default OFF — measured pipeline-level negative (bench.py A/B 2026-08-18,
# v5e, 256^2 b24: 6.39 img/s with the kernel vs 6.78 without).  The
# single-block kernel wins the logits round-trip but pays 3.2x lane-padded
# q/o HBM traffic (head dim 40 -> 128 lanes) plus strided head-column DMA,
# a net loss at every measured shape (tools/ab_cross_attention.py).
# Kept as an opt-in: at head dims near the 128-lane tile the padding
# penalty vanishes and the kernel's fusion is strictly better.
_PACKED_CROSS_ENABLED = False

# Below this q length the single-block cross kernel's grid overhead beats
# its HBM savings (XLA's unfused path on a [B,H,64,77] logits tensor is
# tiny); at/above it the kernel avoids the f32 logits round-trips that the
# whole-program XLA compilation emits (see ops/cross_attention.py).
_CROSS_MIN_Q = 256


def set_packed_flash(flag: bool) -> None:
    """A/B switch for the packed flash path (models fall back to the
    generic [B,T,H,S] dispatch when disabled)."""
    global _PACKED_ENABLED
    _PACKED_ENABLED = bool(flag)


def set_packed_cross(flag: bool) -> None:
    """A/B switch for the fused short-kv cross-attention kernel."""
    global _PACKED_CROSS_ENABLED
    _PACKED_CROSS_ENABLED = bool(flag)


def use_packed_cross(q_len: int, kv_len: int, num_heads: int) -> bool:
    """True when the single-block fused attention kernel
    (`ops.cross_attention.cross_attention_flat`, fed by packed=True
    projections) is the active dispatch for this shape: a short kv
    sequence (the 77-token text context) attended from a long-enough q
    sequence, on TPU, with sequence-parallel attention not claiming it."""
    if not (_PACKED_ENABLED and _PACKED_CROSS_ENABLED):
        return False
    if _ATTENTION_IMPL == "xla":
        return False
    if jax.default_backend() != "tpu":
        return False
    if _sp_claims(q_len, kv_len, num_heads):
        return False
    from ldm_tf2_tpu.ops.cross_attention import MAX_KV_PAD

    return kv_len <= MAX_KV_PAD // 4 and q_len >= _CROSS_MIN_Q


def use_packed_flash(q_len: int, kv_len: int, num_heads: int) -> bool:
    """True when the packed flash entry (`flash_attention_packed`, fed by
    packed=True projections) is the active dispatch for this shape: flash
    would be selected and sequence-parallel attention is not claiming it.
    Lets modules skip the [B,T,H,S] relayout entirely."""
    if not _PACKED_ENABLED:
        return False
    if _sp_claims(q_len, kv_len, num_heads):
        return False
    return _use_flash(q_len, kv_len)


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float | None = None
) -> jnp.ndarray:
    """Scaled dot-product attention, [B,Q,H,S] x [B,C,H,S] -> [B,Q,H,S].

    ``scale`` defaults to ``S ** -0.5`` (unet.py:281).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _use_sequence_parallel(q, k):
        from ldm_tf2_tpu.ops.sequence_parallel import (
            sequence_parallel_attention,
        )

        mesh, axis, _ = _SP_STATE
        return sequence_parallel_attention(q, k, v, mesh, scale, axis)
    return _local_attention(q, k, v, scale)
