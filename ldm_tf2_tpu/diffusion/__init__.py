"""Diffusion process math: beta schedules, DDIM tables, samplers, losses."""

from ldm_tf2_tpu.diffusion.schedule import DiffusionSchedule, make_schedule

__all__ = ["DiffusionSchedule", "make_schedule"]
