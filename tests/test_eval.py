"""Tests for eval_and_viz, evaluate_3d, inference APIs and the viewer."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssdnerf_tpu.models.autodecoders import DiffusionNeRF
from synthetic import make_batch, TINY_MODEL_CFG, TINY_TRAIN_CFG, TINY_TEST_CFG


@pytest.fixture(scope='module')
def model_state():
    model = DiffusionNeRF(dict(TINY_MODEL_CFG),
                          train_cfg=dict(TINY_TRAIN_CFG),
                          test_cfg=dict(TINY_TEST_CFG))
    state = model.init_state(
        jax.random.PRNGKey(0),
        dict(diffusion=dict(type='Adam', lr=1e-4),
             decoder=dict(type='Adam', lr=1e-3)))
    return model, state


def test_eval_and_viz(model_state, tmp_path):
    from ssdnerf_tpu.apis.eval_utils import eval_and_viz
    model, state = model_state
    data_np = make_batch(num_scenes=1, num_views=2, h=16, w=16)
    data = dict(
        scene_name=['0000'],
        test_imgs=data_np['cond_imgs'],
        test_poses=data_np['cond_poses'],
        test_intrinsics=data_np['cond_intrinsics'],
        test_img_paths=[['a/v0.png', 'a/v1.png']])
    code = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                   (1,) + model.code_size)
    bitfield = jnp.full((1, model.grid_size ** 3 // 8), 255, jnp.uint8)
    viz_dir = str(tmp_path / 'viz')
    log_vars, pred = eval_and_viz(model, state, code, bitfield, data,
                                  viz_dir=viz_dir)
    assert 'test_psnr' in log_vars and 'test_ssim' in log_vars
    assert np.isfinite(log_vars['test_psnr'])
    assert pred.shape == (1, 2, 3, 16, 16)
    files = os.listdir(viz_dir)
    assert any(f.startswith('scene_0000_v0_psnr') for f in files), files
    assert any('scene_0000.png' == f for f in files)  # triplane viz


def test_evaluate_3d_with_recon(model_state, tmp_path):
    from ssdnerf_tpu.apis.test import evaluate_3d
    model, state = model_state

    class SyntheticDataset:
        def __init__(self, n=2):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            d = make_batch(num_scenes=1, num_views=3, h=16, w=16, seed=i)
            return dict(
                scene_id=i, scene_name=f'{i:04d}',
                cond_imgs=d['cond_imgs'][0, :1],
                cond_poses=d['cond_poses'][0, :1],
                cond_intrinsics=d['cond_intrinsics'][0, :1],
                test_imgs=d['cond_imgs'][0, 1:],
                test_poses=d['cond_poses'][0, 1:],
                test_intrinsics=d['cond_intrinsics'][0, 1:])

    logs = evaluate_3d(model, state, SyntheticDataset(), batch_size=2,
                       log_fn=lambda s: None)
    assert 'test_psnr' in logs and np.isfinite(logs['test_psnr'])
    assert 'code_rms' in logs


def test_interp_api(model_state):
    from ssdnerf_tpu.apis.inference import interp_diffusion_nerf_ddim
    model, state = model_state
    code, grid, bitfield = interp_diffusion_nerf_ddim(
        model, state, num_intermediate=1, batch_size=1)
    assert code.shape == (3,) + model.code_size
    assert np.isfinite(np.asarray(code)).all()
    code_s, _, _ = interp_diffusion_nerf_ddim(
        model, state, num_intermediate=1, batch_size=1,
        interp_type='spherical_linear')
    assert code_s.shape == (3,) + model.code_size
    assert np.isfinite(np.asarray(code_s)).all()


def test_interp_noise_math():
    """slerp endpoints are exact; intermediates keep ~unit norm (the
    reference's spherical_linear, inference.py:75-80), unlike linear
    interpolation whose midpoint norm collapses by ~sqrt(2)."""
    from ssdnerf_tpu.apis.inference import interp_noise
    key = jax.random.PRNGKey(0)
    ends = jax.random.normal(key, (2, 4, 16, 16))
    for t in ('linear', 'spherical_linear'):
        out = np.asarray(interp_noise(ends, 5, t))
        np.testing.assert_allclose(out[0], np.asarray(ends[0]), atol=1e-5)
        np.testing.assert_allclose(out[-1], np.asarray(ends[1]), atol=1e-5)
    slerp = np.asarray(interp_noise(ends, 5, 'spherical_linear'))
    lin = np.asarray(interp_noise(ends, 5, 'linear'))
    n_ref = np.linalg.norm(np.asarray(ends[0]))
    n_slerp = np.linalg.norm(slerp[2])
    n_lin = np.linalg.norm(lin[2])
    assert abs(n_slerp - n_ref) / n_ref < 0.1
    assert n_lin < 0.85 * n_ref


def test_viewer_headless(model_state, tmp_path):
    from ssdnerf_tpu.core.gui import SSDNeRFViewer, OrbitCamera
    model, state = model_state
    viewer = SSDNeRFViewer(model, state, w=16, h=16, cam_radius=2.6)
    code = 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                   (1,) + model.code_size)
    viewer.set_scene(code)
    img = viewer.render_view()
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    viewer.cam.orbit(30, 10)
    viewer.cam.scale(1)
    img2 = viewer.render_view(downscale=2)
    assert img2.shape == (8, 8, 3)
    # save + reload round trip
    p = str(tmp_path / 'scene.npz')
    viewer.save_scene_file(p)
    viewer.load_scene_file(p)
    # camera math sanity
    cam = OrbitCamera('t', 32, 32, r=2.0, fovy=60)
    pose = cam.pose
    assert pose.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 2.0, atol=1e-5)


def test_camera_spiral_dir_roundtrip(model_state, tmp_path):
    """tools/make_camera_spiral.py output loads through the viewer's
    --cameras path (reference GUI camera-dir init, ssdnerf_gui.py:83-100)
    and the initialized camera reproduces the trajectory pose."""
    import subprocess
    import sys as _sys
    from ssdnerf_tpu.core.gui import SSDNeRFViewer
    model, state = model_state
    cam_dir = str(tmp_path / 'spiral')
    subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), 'tools', 'make_camera_spiral.py'),
         cam_dir, '--frames', '8', '--size', '16', '--focal', '16.4'],
        check=True)
    viewer = SSDNeRFViewer(model, state, w=16, h=16)
    pose = viewer.load_camera_dir(cam_dir, camera_id=3)
    # camera radius = scaled trajectory radius (1.3 * 2), rotation taken
    # from the pose file, fovy from intrinsics
    np.testing.assert_allclose(viewer.cam.radius, 2.6, atol=1e-5)
    np.testing.assert_allclose(viewer.cam.rot, pose[:3, :3], atol=1e-6)
    assert 40 < viewer.cam.fovy < 60
    # pose is a valid rigid transform looking at the origin
    np.testing.assert_allclose(pose[:3, :3] @ pose[:3, :3].T, np.eye(3),
                               atol=1e-6)
    fwd = pose[:3, 2]
    to_origin = -pose[:3, 3] / np.linalg.norm(pose[:3, 3])
    np.testing.assert_allclose(fwd, to_origin, atol=1e-6)
    # the viewer renders from it
    code = 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                   (1,) + model.code_size)
    viewer.set_scene(code)
    img = viewer.render_view()
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()


def test_surround_views():
    from ssdnerf_tpu.core.camera import surround_views
    from synthetic import look_at_pose
    initial = look_at_pose(np.array([1.5, 0.5, 1.5]))
    poses = surround_views(initial, num_frames=12)
    assert poses.shape == (12, 4, 4)
    radii = np.linalg.norm(poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(radii, radii[0], rtol=1e-4)


def test_evaluate_3d_save_scene_and_mesh(model_state, tmp_path):
    from ssdnerf_tpu.apis.test import evaluate_3d
    model, state = model_state
    model.test_cfg['save_dir'] = str(tmp_path / 'save')
    model.test_cfg['save_mesh'] = True
    model.test_cfg['mesh_resolution'] = 24
    model.test_cfg['mesh_threshold'] = 0.001
    try:
        class DS:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                d = make_batch(num_scenes=1, num_views=2, h=16, w=16, seed=i)
                return dict(scene_id=i, scene_name=f'{i:04d}',
                            cond_imgs=d['cond_imgs'][0, :1],
                            cond_poses=d['cond_poses'][0, :1],
                            cond_intrinsics=d['cond_intrinsics'][0, :1])

        evaluate_3d(model, state, DS(), batch_size=1, log_fn=lambda s: None)
        files = os.listdir(str(tmp_path / 'save'))
        assert '0000.npz' in files
        assert '0000.stl' in files
    finally:
        model.test_cfg.pop('save_dir')
        model.test_cfg.pop('save_mesh')
