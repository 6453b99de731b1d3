from .triplane import TriPlaneDecoder
from .renderer import volume_render, update_density_grid, get_density

__all__ = ['TriPlaneDecoder', 'volume_render', 'update_density_grid', 'get_density']
