from .schedules import (
    DiffusionSchedule,
    SpacedSchedule,
    enforce_zero_terminal_snr,
    make_beta_schedule,
    space_timesteps,
)
from .diffusion import Diffusion

__all__ = [
    "Diffusion",
    "DiffusionSchedule",
    "SpacedSchedule",
    "enforce_zero_terminal_snr",
    "make_beta_schedule",
    "space_timesteps",
]
