from .sharding import (make_mesh, replicate, shard_scenes,
                       make_parallel_train_step, make_parallel_bank_step)

__all__ = ['make_mesh', 'replicate', 'shard_scenes',
           'make_parallel_train_step', 'make_parallel_bank_step']
