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
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

_ATTENTION_IMPL = "auto"

# Below this q-sequence length the XLA path wins (kernel launch + padding
# overheads dominate); above it the flash kernel's HBM savings win.
_FLASH_MIN_SEQ_LEN = 1024


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


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float | None = None
) -> jnp.ndarray:
    """Scaled dot-product attention, [B,Q,H,S] x [B,C,H,S] -> [B,Q,H,S].

    ``scale`` defaults to ``S ** -0.5`` (unet.py:281).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _use_flash(q.shape[1], k.shape[1]):
        from ldm_tf2_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)
