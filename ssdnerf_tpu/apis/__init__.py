from .train import train_model
from .test import evaluate_3d
from .eval_utils import eval_and_viz
from .inference import init_model, interp_diffusion_nerf_ddim

__all__ = ['train_model', 'evaluate_3d', 'eval_and_viz', 'init_model',
           'interp_diffusion_nerf_ddim']
