"""ssdnerf_tpu — TPU-native SSDNeRF framework.

See README.md for the architecture overview, STATUS.md for the component
inventory, and PERF.md for TPU performance notes.
"""
__version__ = '0.1.0'

from .config import Config
from .registry import build_model, register_model

__all__ = ['Config', 'build_model', 'register_model', '__version__']
