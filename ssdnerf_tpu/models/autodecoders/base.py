"""Auto-decoder NeRF core machinery (functional).

TPU-native equivalents of ``BaseNeRF``
(/root/reference/lib/models/autodecoders/base_nerf.py:79-673):

- Per-scene optimizer state is a *stacked* Adam (one vectorized update over
  the whole scene batch) replacing the reference's N Python ``torch.optim``
  objects — exactly matching torch.optim.Adam's update formula including
  its eps placement so that cached optimizer states are interchangeable.
- ``inverse_code`` (base_nerf.py:403-492) becomes a ``lax.scan`` over inner
  steps with the density-grid refresh folded in as a ``lax.cond``.
- Ray batches are pre-gathered index arrays (static shapes) instead of
  host-side ``randperm`` per step.
"""
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..decoders.renderer import (volume_render, update_density_grid,
                                 update_density_grid_partial, occupancy_pack)


# --------------------------------------------------------------------- #
# vectorized per-scene Adam (torch.optim.Adam semantics)
# --------------------------------------------------------------------- #
class SceneOptState(NamedTuple):
    m: jnp.ndarray      # (S, *code_size) first moment
    v: jnp.ndarray      # (S, *code_size) second moment
    step: jnp.ndarray   # (S,) int32


def adam_init(code_):
    return SceneOptState(
        m=jnp.zeros_like(code_), v=jnp.zeros_like(code_),
        step=jnp.zeros((code_.shape[0],), jnp.int32))


def adam_step(code_, grad, state: SceneOptState, lr, betas=(0.9, 0.999),
              eps=1e-8, weight_decay=0.0):
    """One vectorized Adam step over stacked per-scene codes.

    ``lr`` may be a scalar or (S,) per-scene learning rates (needed for the
    per-scene ExponentialLR at test time).
    """
    b1, b2 = betas
    if weight_decay:
        grad = grad + weight_decay * code_
    step = state.step + 1
    m = b1 * state.m + (1 - b1) * grad
    v = b2 * state.v + (1 - b2) * grad * grad
    stepf = step.astype(jnp.float32)
    bc1 = 1 - b1 ** stepf
    bc2 = 1 - b2 ** stepf
    shape = (-1,) + (1,) * (code_.ndim - 1)
    # torch: denom = sqrt(v)/sqrt(bc2) + eps ; p -= (lr/bc1) * m / denom
    denom = jnp.sqrt(v) / jnp.sqrt(bc2).reshape(shape) + eps
    lr = jnp.broadcast_to(jnp.asarray(lr, jnp.float32), step.shape)
    new_code = code_ - (lr / bc1).reshape(shape) * m / denom
    return new_code, SceneOptState(m=m, v=v, step=step)


def grad_stats_logvars(prefix, grads):
    """Per-parameter gradient RMS/std/mean scalars for SaveStatsHook —
    the reference dumps the same three stats per param per rank
    (lib/runner/hooks/save_stats.py)."""
    out = {}
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        name = jax.tree_util.keystr(path).replace("'", '').replace('][', '.')\
            .strip('[]')
        g = g.astype(jnp.float32)
        out[f'grad_rms/{prefix}.{name}'] = jnp.sqrt(jnp.mean(g * g))
        out[f'grad_std/{prefix}.{name}'] = jnp.std(g)
        out[f'grad_mean/{prefix}.{name}'] = jnp.mean(g)
    return out


# --------------------------------------------------------------------- #
# ray sampling
# --------------------------------------------------------------------- #
def ray_sample(cond_rays_o, cond_rays_d, cond_imgs, n_samples, key=None,
               sample_inds=None):
    """Sample rays uniformly per scene (base_nerf.py:231-261).

    Args:
        cond_rays_o/d/imgs: (S, V, h, w, 3).
        n_samples: static int.
        key: PRNG key (used when sample_inds is None).
        sample_inds: optional (S, n_samples) precomputed indices.

    Returns: rays_o, rays_d, target_rgbs each (S, n_samples, 3).
    """
    S = cond_rays_o.shape[0]
    P = int(np.prod(cond_rays_o.shape[1:4]))
    rays_o = cond_rays_o.reshape(S, P, 3)
    rays_d = cond_rays_d.reshape(S, P, 3)
    rgbs = cond_imgs.reshape(S, P, 3)
    if P > n_samples:
        if sample_inds is None:
            keys = jax.random.split(key, S)
            sample_inds = jax.vmap(
                lambda k: jax.random.permutation(k, P)[:n_samples])(keys)
        take = lambda a: jnp.take_along_axis(a, sample_inds[..., None], axis=1)
        rays_o, rays_d, rgbs = take(rays_o), take(rays_d), take(rgbs)
    return rays_o, rays_d, rgbs


def make_raybatch_indices(key, num_scenes, num_pixels, n_rays, num_steps):
    """Pre-shuffled cycling ray batches (base_nerf.py:263-274): per scene a
    fresh permutation split into batches, cycled over ``num_steps`` steps.

    Returns (num_steps, num_scenes, n_rays) int32, or None if the scene has
    fewer pixels than one batch (then all rays are used each step).
    """
    if num_pixels <= n_rays:
        return None
    num_batches = num_pixels // n_rays  # drop the ragged tail batch
    keys = jax.random.split(key, num_scenes)
    perm = jax.vmap(lambda k: jax.random.permutation(k, num_pixels))(keys)
    batches = perm[:, :num_batches * n_rays].reshape(
        num_scenes, num_batches, n_rays).transpose(1, 0, 2)
    reps = int(np.ceil(num_steps / num_batches))
    return jnp.tile(batches, (reps, 1, 1))[:num_steps]


# --------------------------------------------------------------------- #
# rendering loss
# --------------------------------------------------------------------- #
def rendering_loss(decoder, decoder_params, code, density_bitfield,
                   target_rgbs, rays_o, rays_d, grid_size, pixel_loss,
                   reg_loss=None, bg_color=1.0, dt_gamma=0.0, perturb_key=None,
                   scale_num_ray=1.0, loss_coef=None, step_chunk=None,
                   deterministic=True, dropout_key=None, occ_table=None):
    """Rendering loss on a ray batch (base_nerf.py:276-296).

    Returns (loss, (out_rgbs, loss_dict)).
    """
    outputs = volume_render(
        decoder, decoder_params, code, rays_o, rays_d, density_bitfield,
        grid_size, dt_gamma=dt_gamma, perturb_key=perturb_key,
        step_chunk=step_chunk, deterministic=deterministic,
        dropout_key=dropout_key, occ_table=occ_table)
    out_rgbs = outputs['image'] + bg_color * (1 - outputs['weights_sum'][..., None])
    scale = 1 - np.exp(-loss_coef * scale_num_ray) if loss_coef is not None else 1.0
    p_loss = pixel_loss(out_rgbs, target_rgbs) * (scale * 3)
    loss = p_loss
    loss_dict = {'pixel_loss': p_loss}
    if reg_loss is not None:
        r_loss = reg_loss(code)
        loss = loss + r_loss
        loss_dict['reg_loss'] = r_loss
    return loss, (out_rgbs, loss_dict)


# --------------------------------------------------------------------- #
# inverse rendering (code optimization) loop
# --------------------------------------------------------------------- #
def inverse_code(decoder, decoder_params, code_activation, code_act_state,
                 cond_rays_o, cond_rays_d, cond_imgs, key,
                 code_, opt_state, density_grid, density_bitfield,
                 *, grid_size, pixel_loss, reg_loss=None, bg_color=1.0,
                 dt_gamma=0.0, n_inverse_steps, n_inverse_rays,
                 loss_coef=None, optimizer_cfg=None, lr_scheduler_cfg=None,
                 prior_grad=None, density_thresh=0.01,
                 update_extra_interval=16, step_chunk=None,
                 density_point_chunk=None, partial_density_updates=False):
    """Optimize per-scene raw codes by inverse volume rendering
    (base_nerf.py:403-492), as a single lax.scan.

    ``prior_grad`` (S, *code_size) is added to the rendering gradient every
    step — the reference's ``code_.grad.copy_(prior_grad)``-then-backward
    accumulation (diffusion_nerf.py:128-137).

    Returns (code_, opt_state, density_grid, density_bitfield, aux) where
    aux holds the last step's loss/log values and rendered rays.
    """
    optimizer_cfg = optimizer_cfg or {}
    lr0 = optimizer_cfg.get('lr', 1e-2)
    betas = tuple(optimizer_cfg.get('betas', (0.9, 0.999)))
    weight_decay = optimizer_cfg.get('weight_decay', 0.0)
    gamma = None
    if lr_scheduler_cfg:
        assert lr_scheduler_cfg.get('type') == 'ExponentialLR'
        gamma = lr_scheduler_cfg['gamma']

    S = cond_imgs.shape[0]
    num_pixels = int(np.prod(cond_imgs.shape[1:4]))
    key, bkey = jax.random.split(key)
    raybatch_inds = make_raybatch_indices(
        bkey, S, num_pixels, n_inverse_rays, n_inverse_steps)

    def loss_fn(code__, bitfield, occ_table, rays_o, rays_d, target, pkey,
                dkey):
        code = code_activation(code__, code_act_state)
        loss, aux = rendering_loss(
            decoder, decoder_params, code, bitfield, target, rays_o, rays_d,
            grid_size, pixel_loss, reg_loss, bg_color, dt_gamma,
            perturb_key=pkey, scale_num_ray=num_pixels, loss_coef=loss_coef,
            step_chunk=step_chunk, deterministic=False, dropout_key=dkey,
            occ_table=occ_table)
        return loss, aux

    # Pallas march table: recomputed only when the density grid updates
    # (every ``update_extra_interval`` steps), not per render.
    table0 = occupancy_pack(decoder, density_bitfield, grid_size)
    use_pack = table0 is not None
    if not use_pack:  # dummy carried through the scan, ignored by renders
        table0 = jnp.zeros((S, 1, 1), jnp.bfloat16)

    def step_fn(carry, xs):
        code_, opt_state, grid, bitfield, table, key = carry
        step_i, inds = xs
        key, ukey, skey, pkey, dkey = jax.random.split(key, 5)

        code = code_activation(code_, code_act_state)

        def do_update():
            kwargs = dict(density_thresh=density_thresh,
                          point_chunk=density_point_chunk)
            if partial_density_updates:
                # first update of the loop is a full sweep, later ones the
                # stochastic partial refresh (torch-ngp schedule)
                g2, b2, _ = jax.lax.cond(
                    step_i == 0,
                    lambda: update_density_grid(
                        decoder, decoder_params, code, grid, ukey, grid_size,
                        **kwargs),
                    lambda: update_density_grid_partial(
                        decoder, decoder_params, code, grid, ukey, grid_size,
                        **kwargs))
            else:
                g2, b2, _ = update_density_grid(
                    decoder, decoder_params, code, grid, ukey, grid_size,
                    **kwargs)
            t2 = occupancy_pack(decoder, b2, grid_size) if use_pack \
                else table
            return g2, b2, t2

        grid, bitfield, table = jax.lax.cond(
            step_i % update_extra_interval == 0,
            do_update, lambda: (grid, bitfield, table))

        if raybatch_inds is None:
            rays_o, rays_d, target = ray_sample(
                cond_rays_o, cond_rays_d, cond_imgs, n_inverse_rays, key=skey)
        else:
            rays_o, rays_d, target = ray_sample(
                cond_rays_o, cond_rays_d, cond_imgs, n_inverse_rays,
                sample_inds=inds)

        (loss, (out_rgbs, loss_dict)), grad = jax.value_and_grad(
            loss_fn, has_aux=True)(code_, bitfield, table, rays_o, rays_d,
                                   target, pkey, dkey)
        if prior_grad is not None:
            grad = grad + prior_grad
        lr = lr0 if gamma is None else \
            lr0 * gamma ** opt_state.step.astype(jnp.float32)
        code_, opt_state = adam_step(code_, grad, opt_state, lr, betas,
                                     weight_decay=weight_decay)
        aux = dict(loss=loss, out_rgbs=out_rgbs, target_rgbs=target,
                   **loss_dict)
        return (code_, opt_state, grid, bitfield, table, key), aux

    if raybatch_inds is None:
        xs = (jnp.arange(n_inverse_steps),
              jnp.zeros((n_inverse_steps, 1), jnp.int32))
    else:
        xs = (jnp.arange(n_inverse_steps), raybatch_inds)
    (code_, opt_state, density_grid, density_bitfield, _, _), aux_all = \
        jax.lax.scan(step_fn,
                     (code_, opt_state, density_grid, density_bitfield,
                      table0, key),
                     xs)
    aux_last = jax.tree_util.tree_map(lambda a: a[-1], aux_all)
    return code_, opt_state, density_grid, density_bitfield, aux_last


# --------------------------------------------------------------------- #
# image rendering
# --------------------------------------------------------------------- #
def render_views(decoder, decoder_params, code, density_bitfield, grid_size,
                 poses, intrinsics, h, w, dt_gamma_scale=0.0, bg_color=1.0,
                 max_render_rays=-1, step_chunk=None):
    """Render full images for a batch of scenes/cameras
    (base_nerf.py:494-533).

    Args:
        poses: (S, V, 4, 4); intrinsics: (S, V, 4).

    Returns image (S, V, h, w, 3), depth (S, V, h, w).
    """
    from ...ops import get_cam_rays
    S, V = poses.shape[:2]
    dt_gamma = dt_gamma_scale * 2 / (
        intrinsics[..., 0] + intrinsics[..., 1]).mean(axis=-1)
    rays_o, rays_d = get_cam_rays(poses, intrinsics, h, w)
    rays_o = rays_o.reshape(S, V * h * w, 3)
    rays_d = rays_d.reshape(S, V * h * w, 3)
    total = V * h * w
    occ_table = occupancy_pack(decoder, density_bitfield, grid_size)

    def render_chunk(ro, rd):
        out = volume_render(
            decoder, decoder_params, code, ro, rd, density_bitfield,
            grid_size, dt_gamma=dt_gamma, step_chunk=step_chunk,
            occ_table=occ_table)
        img = out['image'] + bg_color * (1 - out['weights_sum'][..., None])
        return img, out['depth']

    if 0 < max_render_rays < total:
        n_chunks = int(np.ceil(total / max_render_rays))
        pad = n_chunks * max_render_rays - total
        ro = jnp.pad(rays_o, ((0, 0), (0, pad), (0, 0)))
        rd = jnp.pad(rays_d, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
        ro = ro.reshape(S, n_chunks, max_render_rays, 3).transpose(1, 0, 2, 3)
        rd = rd.reshape(S, n_chunks, max_render_rays, 3).transpose(1, 0, 2, 3)
        img, depth = jax.lax.map(lambda args: render_chunk(*args), (ro, rd))
        img = img.transpose(1, 0, 2, 3).reshape(S, -1, 3)[:, :total]
        depth = depth.transpose(1, 0, 2).reshape(S, -1)[:, :total]
    else:
        img, depth = render_chunk(rays_o, rays_d)
    return img.reshape(S, V, h, w, 3), depth.reshape(S, V, h, w)
