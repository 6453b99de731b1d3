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
    import dearpygui.dearpygui as dpg
    W, H = viewer.cam.W, viewer.cam.H
    dpg.create_context()
    with dpg.texture_registry():
        import numpy as np
        dpg.add_raw_texture(W, H, np.zeros((H, W, 3), np.float32),
                            format=dpg.mvFormat_Float_rgb, tag='_texture')
    with dpg.window(tag='_primary', width=W, height=H):
        dpg.add_image('_texture')
    with dpg.window(label='Control', width=260):
        dpg.add_button(label='Generate',
                       callback=lambda: (viewer.generate(), _refresh()))
        dpg.add_button(label='Export mesh',
                       callback=lambda: viewer.export_mesh('scene.stl'))
        dpg.add_button(label='Export video',
                       callback=lambda: viewer.render_orbit_video('scene.mp4'))

    def _refresh():
        img = viewer.render_view()
        dpg.set_value('_texture', img.astype('float32'))

    def _drag(sender, app_data):
        viewer.cam.orbit(app_data[1], app_data[2])
        _refresh()

    with dpg.handler_registry():
        dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left,
                                   callback=_drag)
        dpg.add_mouse_wheel_handler(
            callback=lambda s, a: (viewer.cam.scale(a), _refresh()))
    dpg.create_viewport(title='ssdnerf-tpu', width=W + 280, height=H + 40)
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
