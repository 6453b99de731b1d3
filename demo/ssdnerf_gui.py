#!/usr/bin/env python
"""Interactive SSDNeRF viewer.

CLI mirror of /root/reference/demo/ssdnerf_gui.py:29-48.  With dearpygui
installed this opens the interactive orbit viewer (generate / load / save /
mesh+video export); otherwise it falls back to a headless mode that renders
an orbit video and optionally a mesh for a generated or loaded scene.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='SSDNeRF viewer')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--fp16', action='store_true',
                        help='bf16 diffusion sampling on TPU')
    parser.add_argument('--pose-path', default=None)
    parser.add_argument('--cameras', default=None,
                        help='SRN-format trajectory dir (intrinsics.txt + '
                             'pose/*.txt) to initialize the camera from, '
                             'as the reference GUI does (its demo ships '
                             'demo/camera_spiral_cars; generate one with '
                             'tools/make_camera_spiral.py)')
    parser.add_argument('--camera-id', type=int, default=64,
                        help='which pose of --cameras to start from')
    parser.add_argument('--seed', type=int, default=0)
    # headless options
    parser.add_argument('--scene', default=None,
                        help='load a saved scene file instead of sampling')
    parser.add_argument('--out-video', default=None)
    parser.add_argument('--out-mesh', default=None)
    parser.add_argument('--num-frames', type=int, default=60)
    parser.add_argument('--mesh-resolution', type=int, default=256)
    parser.add_argument('--mesh-threshold', type=float, default=10.0)
    return parser.parse_args()


def run_headless(viewer, args):
    if args.scene:
        viewer.load_scene_file(args.scene)
        print(f'Loaded scene from {args.scene}')
    else:
        print('Sampling a scene with DDIM...')
        viewer.generate(seed=args.seed)
    out_video = args.out_video or 'viewer_orbit.mp4'
    print(f'Rendering orbit video -> {out_video}')
    viewer.render_orbit_video(out_video, num_frames=args.num_frames)
    if args.out_mesh:
        print(f'Extracting mesh -> {args.out_mesh}')
        viewer.export_mesh(args.out_mesh, resolution=args.mesh_resolution,
                           threshold=args.mesh_threshold)


def run_dearpygui(viewer, args):
    """Interactive viewer with the reference's control set
    (lib/core/ssdnerf_gui.py:139-283): dynamic resolution while dragging,
    generate with seed + DDIM-step controls, scene save/load, camera pose
    loading, fovy/radius sliders, mesh/video export with parameters."""
    import time
    import numpy as np
    import dearpygui.dearpygui as dpg
    W, H = viewer.cam.W, viewer.cam.H
    state = dict(downscale=1, last_full=0.0, dragging=False)

    def _refresh(downscale=None):
        if viewer.code is None:
            return
        ds = downscale or state['downscale']
        t0 = time.perf_counter()
        img = viewer.render_view(downscale=ds)
        dt = time.perf_counter() - t0
        if ds > 1:  # upscale preview to the texture size
            reps = ds
            img = np.repeat(np.repeat(img, reps, axis=0), reps, axis=1)
        img = img[:H, :W]
        dpg.set_value('_texture', np.ascontiguousarray(
            img, dtype=np.float32))
        dpg.set_value('_log_time', f'render: {dt*1e3:.0f} ms (1/{ds})')

    def _generate():
        viewer.generate(seed=int(dpg.get_value('_seed')),
                        num_timesteps=int(dpg.get_value('_ddim_steps')))
        _refresh()

    def _drag(sender, app_data):
        viewer.cam.orbit(app_data[1], app_data[2])
        # dynamic resolution: coarse renders while interacting
        # (ssdnerf_gui.py:185-191)
        _refresh(downscale=int(dpg.get_value('_drag_downscale')))
        state['dragging'] = True

    def _release():
        if state['dragging']:
            state['dragging'] = False
            _refresh(downscale=1)

    dpg.create_context()
    with dpg.texture_registry():
        dpg.add_raw_texture(W, H, np.zeros((H, W, 3), np.float32),
                            format=dpg.mvFormat_Float_rgb, tag='_texture')
    with dpg.window(tag='_primary', width=W, height=H):
        dpg.add_image('_texture')
    with dpg.window(label='Control', width=300, pos=(W + 10, 0)):
        dpg.add_text('', tag='_log_time')
        with dpg.collapsing_header(label='Generate', default_open=True):
            dpg.add_input_int(label='seed', tag='_seed',
                              default_value=args.seed)
            dpg.add_slider_int(label='DDIM steps', tag='_ddim_steps',
                               default_value=int(viewer.model.test_cfg.get(
                                   'num_timesteps', 50)),
                               min_value=5, max_value=200)
            dpg.add_button(label='Generate', callback=_generate)
        with dpg.collapsing_header(label='Camera', default_open=True):
            dpg.add_slider_float(
                label='fovy', default_value=viewer.cam.fovy,
                min_value=20, max_value=90,
                callback=lambda s, a: (setattr(viewer.cam, 'fovy', a),
                                       _refresh()))
            dpg.add_slider_float(
                label='radius', default_value=viewer.cam.radius,
                min_value=0.5, max_value=5.0,
                callback=lambda s, a: (setattr(viewer.cam, 'radius', a),
                                       _refresh()))
            dpg.add_slider_int(label='drag 1/res', tag='_drag_downscale',
                               default_value=4, min_value=1, max_value=8)
            dpg.add_input_text(label='pose file', tag='_pose_path',
                               default_value=args.pose_path or '')
            dpg.add_button(
                label='Load pose',
                callback=lambda: (viewer.load_pose_file(
                    dpg.get_value('_pose_path')), _refresh()))
        with dpg.collapsing_header(label='Scene I/O', default_open=True):
            dpg.add_input_text(label='scene file', tag='_scene_path',
                               default_value=args.scene or 'scene.npz')
            dpg.add_button(
                label='Load scene',
                callback=lambda: (viewer.load_scene_file(
                    dpg.get_value('_scene_path')), _refresh()))
            dpg.add_button(
                label='Save scene',
                callback=lambda: viewer.save_scene_file(
                    dpg.get_value('_scene_path')))
        with dpg.collapsing_header(label='Export', default_open=True):
            dpg.add_input_int(label='mesh res', tag='_mesh_res',
                              default_value=args.mesh_resolution)
            dpg.add_input_float(label='mesh thresh', tag='_mesh_thresh',
                                default_value=args.mesh_threshold)
            dpg.add_button(
                label='Export mesh',
                callback=lambda: viewer.export_mesh(
                    'scene.stl', resolution=int(dpg.get_value('_mesh_res')),
                    threshold=float(dpg.get_value('_mesh_thresh'))))
            dpg.add_input_int(label='video frames', tag='_vid_frames',
                              default_value=args.num_frames)
            dpg.add_button(
                label='Export video',
                callback=lambda: viewer.render_orbit_video(
                    'scene.mp4',
                    num_frames=int(dpg.get_value('_vid_frames'))))

    with dpg.handler_registry():
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                   callback=_drag)
        dpg.add_mouse_release_handler(callback=lambda s, a: _release())
        dpg.add_mouse_wheel_handler(
            callback=lambda s, a: (viewer.cam.scale(a), _refresh()))
    dpg.create_viewport(title='ssdnerf-tpu', width=W + 320, height=H + 40)
    dpg.setup_dearpygui()
    if viewer.code is not None:
        _refresh()
    dpg.show_viewport()
    dpg.set_primary_window('_primary', True)
    dpg.start_dearpygui()
    dpg.destroy_context()


def main():
    args = parse_args()
    from ssdnerf_tpu.apis.inference import init_model
    from ssdnerf_tpu.core.gui import SSDNeRFViewer

    model, state = init_model(args.config, args.checkpoint,
                              use_fp16=args.fp16)
    viewer = SSDNeRFViewer(model, state)
    if args.cameras:
        viewer.load_camera_dir(args.cameras, camera_id=args.camera_id)
    try:
        import dearpygui.dearpygui  # noqa: F401
        has_gui = True
    except ImportError:
        has_gui = False
    if has_gui and os.environ.get('DISPLAY'):
        if args.scene:
            viewer.load_scene_file(args.scene)
        run_dearpygui(viewer, args)
    else:
        run_headless(viewer, args)


if __name__ == '__main__':
    main()
