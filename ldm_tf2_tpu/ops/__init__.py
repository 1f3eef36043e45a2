"""TPU compute ops: attention, normalization fusions, resize primitives.

The default implementations are pure jnp/XLA (which fuses elementwise chains
into matmuls on its own); the Pallas kernels in this package are drop-in
replacements for the hot paths, selected via `set_attention_impl`.
"""

from ldm_tf2_tpu.ops.attention import (
    disable_sequence_parallel,
    dot_product_attention,
    enable_sequence_parallel,
    get_attention_impl,
    set_attention_impl,
)
from ldm_tf2_tpu.ops.resize import nearest_upsample_2x

__all__ = [
    "disable_sequence_parallel",
    "dot_product_attention",
    "enable_sequence_parallel",
    "get_attention_impl",
    "set_attention_impl",
    "nearest_upsample_2x",
]
