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


def make_parallel_bank_step(model, txs, mesh, axis_name='data'):
    """Fused gather + train + scatter over the MESH-SHARDED scene bank.

    The multi-chip analogue of the runner's single-chip fused bank step:
    the whole HBM scene bank (sharded over the scene axis so each chip
    holds an even slice, DeviceSceneCache) is DONATED into one jitted
    program per iteration — the batch rows are gathered from their owning
    chips, resharded to the data axis, trained, and scattered back with an
    in-place dynamic-update-slice.  No per-iteration bank-sized copy, no
    separate gather/scatter dispatches.  The reference instead round-trips
    per-scene state CPU<->GPU every iteration and keeps the cache
    rank-sharded at host granularity
    (/root/reference/lib/models/autodecoders/multiscene_nerf.py:44-51,
    71-183).
    """
    from ..models.autodecoders import DiffusionNeRF
    from ..models.autodecoders.multiscene import DeviceSceneCache

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

    gather = DeviceSceneCache.gather_rows
    scatter = DeviceSceneCache.scatter_rows

    def bank_step(bank, state, idx, data, key):
        scene_batch = gather(bank, idx)
        # the gathered batch rows compute data-parallel over the mesh
        scene_batch = jax.lax.with_sharding_constraint(
            scene_batch,
            jax.tree_util.tree_map(lambda _: scene_sharded, scene_batch))
        state, scene_batch, logs = raw_step(state, scene_batch, data, key)
        return scatter(bank, idx, scene_batch), state, logs

    def scene_spec(tree):
        return jax.tree_util.tree_map(
            lambda x: scene_sharded if getattr(x, 'ndim', 0) >= 1 else repl,
            tree)

    def compile_for(bank, state, idx, data, key):
        in_shardings = (
            jax.tree_util.tree_map(lambda _: scene_sharded, bank),
            jax.tree_util.tree_map(lambda _: repl, state),
            repl,                    # batch row indices (replicated)
            scene_spec(data),
            repl,
        )
        return jax.jit(bank_step, in_shardings=in_shardings,
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
