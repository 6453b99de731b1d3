"""Interactive viewer core.

Headless-capable re-design of the dearpygui viewer
(/root/reference/lib/core/ssdnerf_gui.py): ``OrbitCamera`` (:21) and the
render/diffusion/update/export logic of ``SSDNeRFGUI`` (:67-589) live in
``SSDNeRFViewer`` with no GUI dependency — usable headless for video/mesh
export and remote render services; the dearpygui front-end in
``demo/ssdnerf_gui.py`` drives it when dearpygui is installed.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from .camera import surround_views
from .mesh import extract_geometry, save_stl


class OrbitCamera:
    def __init__(self, name, w, h, r=2.0, fovy=60.0, euler=(0, 0, 0)):
        self.name = name
        self.W = w
        self.H = h
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        self.default_rot = self._euler_rot(euler)
        self.rot = self.default_rot.copy()
        self.up = np.array([0, 1, 0], np.float32)

    @staticmethod
    def _euler_rot(euler):
        rx, ry, rz = np.deg2rad(euler)

        def rot_x(a):
            return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                             [0, np.sin(a), np.cos(a)]], np.float32)

        def rot_y(a):
            return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                             [-np.sin(a), 0, np.cos(a)]], np.float32)

        def rot_z(a):
            return np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32)

        return rot_z(rz) @ rot_y(ry) @ rot_x(rx)

    @property
    def pose(self):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = self.rot
        pose[:3, 3] = self.rot @ np.array([0, 0, -self.radius], np.float32) \
            + self.center
        return pose

    @property
    def intrinsics(self):
        focal = self.H / (2 * np.tan(np.deg2rad(self.fovy) / 2))
        return np.array([focal, focal, self.W / 2, self.H / 2], np.float32)

    def orbit(self, dx, dy, sensitivity=0.004):
        # rotate around the camera's right/up axes
        right = self.rot[:, 0]
        rot_y = _axis_angle(self.up, -dx * sensitivity)
        rot_x = _axis_angle(right, -dy * sensitivity)
        self.rot = rot_y @ rot_x @ self.rot

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0, sensitivity=0.001):
        self.center += sensitivity * self.rot @ np.array(
            [dx, dy, dz], np.float32)


def _axis_angle(axis, angle):
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]], np.float32)
    return np.eye(3, dtype=np.float32) + np.sin(angle) * K \
        + (1 - np.cos(angle)) * (K @ K)


class SSDNeRFViewer:
    """Holds one active scene (code + density) and renders views on demand.

    Mirrors SSDNeRFGUI.test_gui / update_params / export paths
    (ssdnerf_gui.py:139-589) without any UI toolkit.
    """

    def __init__(self, model, state, w=512, h=512, max_render_res=128,
                 cam_radius=2.0, cam_fovy=60.0):
        self.model = model
        self.state = state
        self.cam = OrbitCamera('default', w, h, r=cam_radius, fovy=cam_fovy)
        self.max_render_res = max_render_res
        self.code = None
        self.density_bitfield = None
        self.density_grid = None
        self.key = jax.random.PRNGKey(0)

    # ---------------------------------------------------------------- #
    def set_scene(self, code, density_grid=None, density_bitfield=None):
        """Install a scene; rebuilds the density bitfield if not given
        (SSDNeRFGUI.update_params, ssdnerf_gui.py:162-166)."""
        self.code = jnp.asarray(code)
        if self.code.ndim == len(self.model.code_size):
            self.code = self.code[None]
        if density_bitfield is None:
            from ..models.decoders.renderer import get_density
            self.key, sub = jax.random.split(self.key)
            density_grid, density_bitfield = get_density(
                self.model.decoder, self._decoder_params(), self.code, sub,
                self.model.grid_size,
                density_thresh=self.model.test_cfg.get('density_thresh', 0.01))
        self.density_grid = density_grid
        self.density_bitfield = density_bitfield

    def _decoder_params(self):
        state = self.state
        return state.get('decoder_ema', state['decoder']) \
            if self.model.decoder_use_ema else state['decoder']

    def load_scene_file(self, path):
        """Load a saved scene (.npz / .pth) (SSDNeRFGUI load, :400s)."""
        from ..data.shapenet_srn import _load_code_file
        blob = _load_code_file(path)
        code = blob.get('code')
        if code is None:
            code = np.asarray(self.model.code_activation(
                jnp.asarray(blob['code_'], jnp.float32)[None],
                self.state.get('code_act')))[0]
        self.set_scene(
            code,
            jnp.asarray(blob['density_grid'])[None]
            if 'density_grid' in blob else None,
            jnp.asarray(blob['density_bitfield'])[None]
            if 'density_bitfield' in blob else None)

    def save_scene_file(self, path):
        np.savez(path,
                 code=np.asarray(self.code)[0],
                 density_grid=np.asarray(self.density_grid)[0],
                 density_bitfield=np.asarray(self.density_bitfield)[0])

    # ---------------------------------------------------------------- #
    def generate(self, seed=0, num_timesteps=None):
        """Diffusion sample a new scene (the GUI's generate button,
        ssdnerf_gui.py:246-262)."""
        key = jax.random.PRNGKey(seed)
        k_noise, k_samp = jax.random.split(key)
        noise = jax.random.normal(k_noise, (1,) + self.model.code_size)
        if num_timesteps is not None:
            self.model.test_cfg['num_timesteps'] = num_timesteps
        code, grid, bitfield = self.model.val_uncond(self.state, noise,
                                                     k_samp)
        self.code, self.density_grid, self.density_bitfield = \
            code, grid, bitfield
        return code

    def render_view(self, pose=None, intrinsics=None, h=None, w=None,
                    downscale=1):
        """Render one view -> (h, w, 3) float image in [0, 1]
        (SSDNeRFGUI.test_gui, ssdnerf_gui.py:139-160; dynamic resolution
        via ``downscale``, :185-191)."""
        assert self.code is not None, 'no scene loaded'
        pose = self.cam.pose if pose is None else pose
        intrinsics = self.cam.intrinsics if intrinsics is None else intrinsics
        h = (self.cam.H if h is None else h) // downscale
        w = (self.cam.W if w is None else w) // downscale
        intr = np.asarray(intrinsics, np.float32) / downscale
        image, depth = self.model.render(
            self.state, self.code, self.density_bitfield, h, w,
            jnp.asarray(intr)[None, None], jnp.asarray(pose)[None, None])
        return np.clip(np.asarray(image)[0, 0], 0, 1)

    def load_pose_file(self, path):
        """Point the camera at a saved pose (SSDNeRFGUI pose loading,
        ssdnerf_gui.py:283+): a 16-float SRN ``pose/*.txt`` or an ``.npy``
        (4, 4) matrix; position is normalized like the dataset loader."""
        if path.endswith('.npy'):
            pose = np.load(path).astype(np.float32).reshape(4, 4)
        else:
            pose = np.loadtxt(path, dtype=np.float32).reshape(4, 4)
        pose = pose.copy()
        pose[:3, 3] /= 0.5  # SRN radius normalization (shapenet_srn.py:65)
        self.cam.rot = pose[:3, :3]
        self.cam.radius = float(np.linalg.norm(pose[:3, 3] - self.cam.center))
        return pose

    def load_camera_dir(self, path, camera_id=64):
        """Initialize the camera from an SRN-format trajectory directory
        (``intrinsics.txt`` + ``pose/*.txt``) the way the reference GUI
        does (ssdnerf_gui.py:83-100: pick pose ``camera_id`` of the
        sorted listing, scale translation into the unit-scene frame,
        take fov from the intrinsics).  ``tools/make_camera_spiral.py``
        generates such directories."""
        import os
        from ..data.shapenet_srn import load_intrinsics, load_pose
        pose_dir = os.path.join(path, 'pose')
        poses = sorted(os.listdir(pose_dir))
        pose = np.asarray(
            load_pose(os.path.join(pose_dir, poses[camera_id % len(poses)])),
            np.float32).copy()
        pose[:3, 3] *= 2.0  # SRN radius normalization (shapenet_srn.py)
        fx, fy, cx, cy, h, w = load_intrinsics(
            os.path.join(path, 'intrinsics.txt'))
        self.cam.rot = pose[:3, :3]
        self.cam.radius = float(np.linalg.norm(pose[:3, 3] - self.cam.center))
        self.cam.fovy = float(np.degrees(2 * np.arctan(0.5 * h / fy)))
        return pose

    def render_orbit_video(self, path, num_frames=60, fps=20, angle_amp=1.0):
        """Export an orbit video (the GUI's video export)."""
        import imageio
        poses = surround_views(self.cam.pose, angle_amp=angle_amp,
                               num_frames=num_frames)
        frames = []
        for i in range(num_frames):
            img = self.render_view(pose=poses[i])
            frames.append((img * 255).astype(np.uint8))
        imageio.mimwrite(path, frames, fps=fps)
        return path

    def export_mesh(self, path, resolution=256, threshold=10.0):
        """Marching-tets mesh export (SSDNeRFGUI.export_mesh, :579-589)."""
        verts, tris = extract_geometry(
            self.model.decoder, self._decoder_params(), self.code[0],
            resolution=resolution, threshold=threshold)
        save_stl(path, verts, tris)
        return path
