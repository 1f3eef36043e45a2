"""Diffusion process math: beta schedules, DDIM tables, samplers, losses."""

from ldm_tf2_tpu.diffusion.schedule import DiffusionSchedule, make_schedule
from ldm_tf2_tpu.diffusion.solvers import (
    dpm_solver_pp_2m_sample_loop,
    plms_sample_loop,
)

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "plms_sample_loop",
    "dpm_solver_pp_2m_sample_loop",
]
