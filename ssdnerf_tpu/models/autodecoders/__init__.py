from .base import (
    SceneOptState, adam_init, adam_step, ray_sample, make_raybatch_indices,
    rendering_loss, inverse_code, render_views)
from .multiscene import MultiSceneNeRF, SceneCache, DeviceSceneCache
from .diffusion_nerf import DiffusionNeRF

__all__ = [
    'SceneOptState', 'adam_init', 'adam_step', 'ray_sample',
    'make_raybatch_indices', 'rendering_loss', 'inverse_code', 'render_views',
    'MultiSceneNeRF', 'SceneCache', 'DeviceSceneCache', 'DiffusionNeRF',
]
