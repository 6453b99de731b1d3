from .schedules import DiffusionSchedule, make_schedule
from .sampler import build_timestep_sampler
from .gaussian_diffusion import GaussianDiffusion

__all__ = ['DiffusionSchedule', 'make_schedule', 'build_timestep_sampler',
           'GaussianDiffusion']
