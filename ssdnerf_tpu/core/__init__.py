from .checkpoint import save_checkpoint, load_checkpoint
from .metrics import eval_psnr, eval_ssim, eval_ssim_skimage
from .camera import surround_views
from .mesh import extract_geometry, save_stl

__all__ = ['save_checkpoint', 'load_checkpoint', 'eval_psnr', 'eval_ssim',
           'eval_ssim_skimage', 'surround_views', 'extract_geometry',
           'save_stl']
