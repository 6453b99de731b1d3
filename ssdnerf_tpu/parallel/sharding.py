"""Multi-chip sharding (SPMD data parallelism over scenes).

Replaces the reference's DDP/NCCL distribution
(/root/reference/lib/apis/train.py:86-98, SURVEY.md section 2.6) the
TPU-native way: one jitted program over a ``jax.sharding.Mesh`` — model and
optimizer state replicated, the scene batch (codes, Adam moments, density
grids, images, rays) sharded along the scene axis, and XLA inserting the
ICI all-reduces for parameter gradients and the running-stat means
automatically.  The reference's rank-sharded scene cache maps to the
host-local SceneCache shard (one per process); within a host, the device
mesh splits each batch further.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name='data', devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_scenes(tree, mesh, axis_name='data'):
    """Shard every array leaf along its leading (scene) axis."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        if hasattr(x, 'ndim') and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def make_parallel_train_step(model, txs, mesh, axis_name='data'):
    """Build the jitted SPMD train step.

    Model state is replicated; scene_batch and data shard over scenes.  The
    same ``model.train_step`` used single-chip runs unchanged — sharding
    propagation turns the decoder/diffusion gradient means into ICI
    psums and keeps all per-scene work (inverse rendering, density updates,
    per-scene Adam) local to the owning chip.
    """
    from ..models.autodecoders import DiffusionNeRF

    repl = NamedSharding(mesh, P())
    scene_sharded = NamedSharding(mesh, P(axis_name))

    if isinstance(model, DiffusionNeRF):
        tx_diff = txs['diffusion']
        tx_dec = txs.get('decoder', tx_diff)

        def raw_step(state, scene_batch, data, key):
            return model.train_step(state, scene_batch, data, key,
                                    tx_diff, tx_dec)
    else:
        tx_dec = txs['decoder']

        def raw_step(state, scene_batch, data, key):
            return model.train_step(state, scene_batch, data, key, tx_dec)

    def scene_spec(tree):
        return jax.tree_util.tree_map(
            lambda x: scene_sharded if getattr(x, 'ndim', 0) >= 1 else repl,
            tree)

    def compile_for(state, scene_batch, data, key):
        in_shardings = (
            jax.tree_util.tree_map(lambda _: repl, state),
            scene_spec(scene_batch),
            scene_spec(data),
            repl,
        )
        # donate state + scene_batch: both are returned updated each step
        # (EMA params are de-aliased at init so donation is safe)
        return jax.jit(raw_step, in_shardings=in_shardings,
                       donate_argnums=(0, 1))

    return compile_for


def sharded_volume_render(decoder, params, code, rays_o, rays_d,
                          density_bitfield, grid_size, mesh,
                          axis_name='data', **render_kwargs):
    """Render with the RAY axis sharded over the device mesh.

    Beyond-parity scaling (the reference only data-parallelizes over
    scenes): rays are embarrassingly parallel, so a single large render —
    eval-time novel views, GUI frames, video export — splits its ray axis
    across all chips with zero collectives; params, codes and bitfields
    are replicated.  Runs the same ``volume_render`` (fused Pallas path on
    TPU) per shard via ``shard_map``.

    Args:
        rays_o, rays_d: (S, N, 3) with N divisible by the mesh size.
    Returns:
        volume_render's dict, each entry sharded (S, N, ...) on axis 1.
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from ..models.decoders.renderer import volume_render

    def fn(code, ro, rd, bf):
        return volume_render(decoder, params, code, ro, rd, bf, grid_size,
                             **render_kwargs)

    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name), P()),
        out_specs=P(None, axis_name),
        check_rep=False,
    )(code, rays_o, rays_d, density_bitfield)
