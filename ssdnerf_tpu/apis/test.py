"""Offline evaluation API.

Equivalent of ``evaluate_3d`` (/root/reference/lib/apis/test.py:12-69):
iterate a validation dataset in batches, run the model's val_step, compute
reconstruction metrics and feed generated renders to FID/KID metrics.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..data.builder import collate
from .eval_utils import eval_and_viz


def _val_batches(dataset, batch_size, max_num=None):
    n = len(dataset) if max_num is None else min(len(dataset), max_num)
    for i in range(0, n, batch_size):
        ids = list(range(i, min(i + batch_size, n)))
        pad = 0
        if len(ids) < batch_size:
            pad = batch_size - len(ids)
            ids = ids + [ids[-1]] * pad
        yield collate([dataset[j] for j in ids]), pad


def _save_scenes(model, state, batch, code, grid, bitfield, num_valid,
                 save_dir):
    """Per-scene .npz dumps + optional mesh export (base_nerf.py:160-182,
    diffusion_nerf.py:453-461)."""
    import os
    os.makedirs(save_dir, exist_ok=True)
    code_np = np.asarray(code)
    grid_np = np.asarray(grid)
    bf_np = np.asarray(bitfield)
    names = batch.get('scene_name',
                      [f'{int(i):06d}' for i in batch['scene_id']])
    for i in range(num_valid):
        np.savez(os.path.join(save_dir, str(names[i]) + '.npz'),
                 scene_name=str(names[i]), code=code_np[i],
                 density_grid=grid_np[i], density_bitfield=bf_np[i])
    if model.test_cfg.get('save_mesh', False):
        from ..core.mesh import extract_geometry, save_stl
        dec_params = state.get('decoder_ema', state['decoder']) \
            if model.decoder_use_ema else state['decoder']
        res = model.test_cfg.get('mesh_resolution', 256)
        thresh = model.test_cfg.get('mesh_threshold', 10)
        for i in range(num_valid):
            verts, tris = extract_geometry(
                model.decoder, dec_params, jnp.asarray(code_np[i]),
                resolution=res, threshold=thresh)
            save_stl(os.path.join(save_dir, str(names[i]) + '.stl'),
                     verts, tris)


def evaluate_3d(model, state, dataset, batch_size=8, metrics=None,
                viz_dir=None, sample_kwargs=None, max_num_scenes=None,
                seed=0, log_fn=print):
    """Returns aggregated log_vars dict; metric summaries are computed by
    the caller via metric.summary()."""
    metrics = metrics or []
    sums = {}
    weights = {}
    total = 0
    key = jax.random.PRNGKey(seed)
    # jit the val path once; reused across equally-shaped batches
    val_jit = jax.jit(lambda s, d, k: model.val_step(s, d, k))
    for batch, pad in _val_batches(dataset, batch_size, max_num_scenes):
        key, sub = jax.random.split(key)
        data = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                data[k] = jnp.asarray(v)
            else:
                data[k] = v
        if 'code' in batch and isinstance(batch['code'], dict):
            blob = batch['code']
            if 'code' in blob:
                data['code'] = jnp.asarray(blob['code'], jnp.float32)
            elif 'code_' in blob:
                data['code'] = model.code_activation(
                    jnp.asarray(blob['code_'], jnp.float32),
                    state.get('code_act'))
            data['density_grid'] = jnp.asarray(blob['density_grid'])
            data['density_bitfield'] = jnp.asarray(blob['density_bitfield'])

        if 'code' in data:
            code = data['code']
            grid = data['density_grid']
            bitfield = data['density_bitfield']
        else:
            jit_data = {k: v for k, v in data.items()
                        if isinstance(v, jnp.ndarray)}
            code, grid, bitfield = val_jit(state, jit_data, sub)

        num_valid = code.shape[0] - pad
        save_dir = model.test_cfg.get('save_dir')
        if save_dir is not None:
            _save_scenes(model, state, batch, code, grid, bitfield, num_valid,
                         save_dir)
        log_vars = {}
        if 'test_poses' in data:
            log_vars, pred_imgs = eval_and_viz(
                model, state, code, bitfield, batch, viz_dir=viz_dir,
                cfg=model.test_cfg)
            if metrics:
                imgs = np.asarray(pred_imgs.transpose(0, 1, 3, 4, 2))
                imgs = imgs[:num_valid].reshape(-1, *imgs.shape[2:])
                for metric in metrics:
                    metric.feed(imgs, 'fakes')
        code_rms = float(jnp.sqrt(jnp.mean(code[:num_valid] ** 2)))
        log_vars['code_rms'] = code_rms
        for k, v in log_vars.items():
            sums[k] = sums.get(k, 0.0) + float(v) * num_valid
            weights[k] = weights.get(k, 0) + num_valid
        total += num_valid
        log_fn(f'evaluate_3d: {total} scenes done; '
               + ', '.join(f'{k}={float(v):.4f}' for k, v in log_vars.items()))

    sums, weights = allgather_weighted_sums(sums, weights)
    return {k: sums[k] / max(weights[k], 1) for k in sums}


def allgather_weighted_sums(sums, weights):
    """Multi-host weighted all-reduce of eval log vars: every process ends
    up with the dataset-wide sums/weights (lib/apis/test.py:58-69
    all_reduce).  No-op in single-process runs."""
    if jax.process_count() > 1 and sums:
        from jax.experimental import multihost_utils
        keys = sorted(sums)
        packed = np.asarray([[sums[k] for k in keys]
                             + [float(weights[k]) for k in keys]],
                            np.float64).astype(np.float32)
        gathered = multihost_utils.process_allgather(packed)
        agg = np.asarray(gathered).reshape(-1, 2 * len(keys)).sum(axis=0)
        sums = {k: float(agg[i]) for i, k in enumerate(keys)}
        weights = {k: float(agg[len(keys) + i]) for i, k in enumerate(keys)}
    return sums, weights
