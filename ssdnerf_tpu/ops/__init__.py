"""TPU-native ops layer.

Pure-JAX / Pallas replacements for every native CUDA op of the reference
(/root/reference/lib/ops/__init__.py:1-3): ray-AABB intersection, spherical
harmonics encoding, truncated exp, Morton coding, density-bitfield packing,
ray marching and alpha compositing.  All ops use static shapes and are
jit/vmap/grad-compatible.
"""
from .activations import trunc_exp
from .ray_utils import (
    near_far_from_aabb, sph_from_ray, get_ray_directions, get_rays, get_cam_rays)
from .morton import morton3d, morton3d_invert, packbits, unpackbits, morton_grid_indices
from .sh import sh_encode
from .marching import march_rays, MarchResults
from .compositing import composite_rays
from .triplane_sample import grid_sample_2d, sample_triplane

__all__ = [
    'trunc_exp', 'near_far_from_aabb', 'sph_from_ray', 'get_ray_directions',
    'get_rays', 'get_cam_rays', 'morton3d', 'morton3d_invert', 'packbits',
    'unpackbits', 'morton_grid_indices', 'sh_encode', 'march_rays',
    'MarchResults', 'composite_rays', 'grid_sample_2d', 'sample_triplane',
]
