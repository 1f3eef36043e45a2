"""Config layer: the reference's single-YAML surface, validated."""

from ldm_tf2_tpu.configs.loader import load_config

__all__ = ["load_config"]
