"""Ray generation and ray-AABB utilities.

TPU-native (vectorized jnp) equivalents of:
- CUDA ``kernel_near_far_from_aabb``
  (/root/reference/lib/ops/raymarching/src/raymarching.cu:91-156)
- CUDA ``kernel_sph_from_ray`` (raymarching.cu:159-209)
- pinhole ray generation ``get_ray_directions``/``get_rays``/``get_cam_rays``
  (/root/reference/lib/core/utils/nerf_utils.py:17-63)
"""
import jax.numpy as jnp


def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2):
    """Slab test of rays against an axis-aligned box.

    Args:
        rays_o: (..., 3) ray origins.
        rays_d: (..., 3) ray directions (not necessarily unit).
        aabb: (6,) [xmin, ymin, zmin, xmax, ymax, zmax].
        min_near: minimum near distance.

    Returns:
        nears, fars: (...,) intersection distances; fars < nears means a miss
        (the marcher then takes zero samples, matching the CUDA kernel which
        leaves ``near > far`` so the march loop body never runs).
    """
    eps = 1e-15
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < eps, jnp.where(rays_d < 0, -eps, eps), rays_d)
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    nears = jnp.maximum(tmin, min_near)
    # Miss: keep far < near so that zero samples are generated.
    fars = jnp.where(tmax < nears, nears - 1.0, tmax)
    return nears, fars


def sph_from_ray(rays_o, rays_d, radius):
    """Ray / background-sphere intersection -> (theta, phi) in [-1, 1].

    Mirrors raymarching.cu:159-209 (used by the ``bg_radius`` background
    model; all shipped configs disable it but the op is part of the surface).
    Assumes ``rays_o`` lies inside the sphere and ``rays_d`` is unit.
    """
    # solve |o + t d|^2 = r^2 for the positive root
    b = jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    t = -b + jnp.sqrt(jnp.maximum(b * b - c, 0.0))
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + y * y), z) / jnp.pi * 2.0 - 1.0  # [-1, 1]
    phi = jnp.arctan2(y, x) / jnp.pi  # [-1, 1]
    return jnp.stack([theta, phi], axis=-1)


def get_ray_directions(h, w, intrinsics):
    """Pixel-center ray directions in camera coordinates.

    Args:
        h, w: image size (static ints).
        intrinsics: (*, 4) [fx, fy, cx, cy].

    Returns:
        (*, h, w, 3) un-normalized camera-space directions (z = +1 plane).
    """
    batch_shape = intrinsics.shape[:-1]
    x = jnp.linspace(0.5, w - 0.5, w)
    y = jnp.linspace(0.5, h - 0.5, h)
    dir_x = (x - intrinsics[..., 2:3]) / intrinsics[..., 0:1]   # (*, w)
    dir_y = (y - intrinsics[..., 3:4]) / intrinsics[..., 1:2]   # (*, h)
    dir_x = jnp.broadcast_to(dir_x[..., None, :], batch_shape + (h, w))
    dir_y = jnp.broadcast_to(dir_y[..., :, None], batch_shape + (h, w))
    ones = jnp.ones_like(dir_x)
    return jnp.stack([dir_x, dir_y, ones], axis=-1)


def get_rays(directions, c2w, norm=False):
    """Transform camera-space directions into world-space rays.

    Args:
        directions: (*, h, w, 3).
        c2w: (*, 4, 4) or (*, 3, 4) camera-to-world.

    Returns:
        rays_o, rays_d: (*, h, w, 3).
    """
    rot = c2w[..., None, None, :3, :3]                      # (*, 1, 1, 3, 3)
    rays_d = jnp.einsum('...ij,...j->...i', rot, directions)
    rays_o = jnp.broadcast_to(c2w[..., None, None, :3, 3], rays_d.shape)
    if norm:
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d


def get_cam_rays(c2w, intrinsics, h, w):
    """World-space unit rays for a batch of cameras (nerf_utils.py:57-61)."""
    directions = get_ray_directions(h, w, intrinsics)
    return get_rays(directions, c2w, norm=True)
