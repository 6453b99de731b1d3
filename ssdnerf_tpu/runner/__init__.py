from .optim import build_lr_schedule, build_optimizers
from .hooks import (Hook, EMAHook, SaveCacheHook, ResetCacheHook,
                    MeanCacheHook, ModelUpdaterHook, SaveStatsHook,
                    DirCopyHook, TextLoggerHook, CheckpointHook, build_hooks)
from .loop import Runner

__all__ = ['build_lr_schedule', 'build_optimizers', 'Hook', 'EMAHook',
           'SaveCacheHook', 'ResetCacheHook', 'MeanCacheHook',
           'ModelUpdaterHook', 'SaveStatsHook', 'DirCopyHook',
           'TextLoggerHook', 'CheckpointHook', 'build_hooks', 'Runner']
