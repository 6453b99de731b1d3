from .shapenet_srn import ShapeNetSRN, load_intrinsics, load_pose
from .builder import build_dataset, DataLoader

__all__ = ['ShapeNetSRN', 'load_intrinsics', 'load_pose', 'build_dataset',
           'DataLoader']
