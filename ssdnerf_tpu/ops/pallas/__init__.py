"""Pallas TPU kernels for the rendering hot path.

The reference implements these stages as CUDA kernels
(/root/reference/lib/ops/raymarching/src/raymarching.cu,
/root/reference/lib/ops/shencoder/src/shencoder.cu).  Here they are fused
TPU kernels: all fat intermediates (bilinear hat contractions, MLP
activations, occupancy one-hots) stay in VMEM instead of round-tripping
through HBM, which is what bounds the pure-XLA fallback path.
"""
from .decode import (triplane_decode, triplane_decode_banded,
                     triplane_decode_composite, decode_supported)
from .march import march_valid_mask, occupancy_table, march_supported

__all__ = ['triplane_decode', 'triplane_decode_banded',
           'triplane_decode_composite', 'decode_supported',
           'march_valid_mask', 'occupancy_table', 'march_supported']
