from .code_activations import TanhCode, IdentityCode, NormalizedTanhCode, build_code_activation
from .decoders.triplane import TriPlaneDecoder
from .decoders.renderer import volume_render, update_density_grid, get_density

__all__ = [
    'TanhCode', 'IdentityCode', 'NormalizedTanhCode', 'build_code_activation',
    'TriPlaneDecoder', 'volume_render', 'update_density_grid', 'get_density',
]
