"""Bilinear triplane feature sampling.

TPU-native gather+lerp equivalent of ``F.grid_sample(..., mode='bilinear',
padding_mode='border', align_corners=False)`` as used by the reference
triplane decoder (/root/reference/lib/models/decoders/triplane_decoder.py:119-160).
The three plane projections follow ``xyz_transform``
(triplane_decoder.py:104-117): xy, xz, yz.
"""
import jax.numpy as jnp


def grid_sample_2d(image, coords):
    """Bilinear sample with border padding, align_corners=False.

    Args:
        image: (C, H, W) feature plane.
        coords: (N, 2) normalized coords in [-1, 1]; coords[:, 0] indexes W
            (x), coords[:, 1] indexes H (y) — torch grid_sample convention.

    Returns:
        (N, C) sampled features.
    """
    C, H, W = image.shape
    # align_corners=False: pixel centers at (i + 0.5) / size * 2 - 1
    fx = (coords[:, 0] + 1.0) * 0.5 * W - 0.5
    fy = (coords[:, 1] + 1.0) * 0.5 * H - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)

    # TPU layout note: gather along the *leading* axis with 1D outputs per
    # channel — a lane-axis gather like (C, HW)[:, idx] triggers massive
    # lane padding on TPU (21x memory expansion observed).
    flat = image.reshape(C, H * W)

    def take(idx):
        return jnp.stack([flat[c][idx] for c in range(C)], axis=-1)  # (N, C)

    i00 = take(y0i * W + x0i)
    i01 = take(y0i * W + x1i)
    i10 = take(y1i * W + x0i)
    i11 = take(y1i * W + x1i)
    top = i00 * (1.0 - wx) + i01 * wx
    bot = i10 * (1.0 - wx) + i11 * wx
    return top * (1.0 - wy) + bot * wy


def xyz_to_plane_coords(xyz, flip_z=False):
    """Project 3D points onto the three triplane coordinate frames.

    Returns (3, N, 2) with planes ordered (xy, xz, yz); last axis is the
    (grid_x, grid_y) pair fed to :func:`grid_sample_2d`.
    """
    if flip_z:
        xyz = jnp.concatenate([xyz[..., :2], -xyz[..., 2:]], axis=-1)
    xy = xyz[..., 0:2]
    xz = xyz[..., ::2]
    yz = xyz[..., 1:3]
    return jnp.stack([xy, xz, yz], axis=0)


def sample_triplane(code, xyz, flip_z=False):
    """Sample features from a 3-plane code at 3D points.

    Args:
        code: (3, C, H, W) triplane features of one scene.
        xyz: (N, 3) points in [-1, 1] (the NeRF bound cube).

    Returns:
        (N, 3 * C) concatenated per-plane features, ordered plane-major to
        match the reference's ``permute(0, 3, 2, 1)`` layout — feature f of
        plane p lands at column ``f * 3 + p`` (triplane_decoder.py:141).
    """
    coords = xyz_to_plane_coords(xyz, flip_z=flip_z)  # (3, N, 2)
    feats = jnp.stack([
        grid_sample_2d(code[p], coords[p]) for p in range(3)
    ], axis=-1)  # (N, C, 3)
    return feats.reshape(feats.shape[0], -1)  # (N, C * 3), plane fastest
