from .fid import FID, FIDKID, build_metric
from .eval_hooks import GenerativeEvalHook3D

__all__ = ['FID', 'FIDKID', 'build_metric', 'GenerativeEvalHook3D']
