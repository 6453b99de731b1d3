"""Evaluation + visualization helpers.

Equivalent of ``BaseNeRF.eval_and_viz``
(/root/reference/lib/models/autodecoders/base_nerf.py:535-610): render test
views, compute PSNR / SSIM (+ LPIPS when a backend is available), dump
prediction images and triplane visualizations.
"""
import math
import os
from glob import glob

import numpy as np
import jax.numpy as jnp

from ..core.metrics import eval_psnr, eval_ssim_skimage

_LPIPS_BACKEND = None


def _try_lpips():
    """Torch lpips package if importable (pretrained weights); gated."""
    global _LPIPS_BACKEND
    if _LPIPS_BACKEND is not None:
        return _LPIPS_BACKEND
    try:
        import lpips  # noqa
        _LPIPS_BACKEND = lpips.LPIPS(net='vgg', eval_mode=True,
                                     pnet_tune=False)
    except Exception:
        _LPIPS_BACKEND = False
    return _LPIPS_BACKEND


_LPIPS_JAX = None


def _jax_lpips(weights_path=None):
    """JAX-native VGG16 LPIPS (core/evaluation/feature_nets.py); uses
    converted real weights when given, else seeded random features."""
    global _LPIPS_JAX
    if _LPIPS_JAX is None:
        from ..core.evaluation.feature_nets import make_lpips
        _LPIPS_JAX = make_lpips(weights_path)
    return _LPIPS_JAX


def visualize_triplane(code, scene_names, viz_dir, code_range=(-1, 1),
                       flip_z=False):
    """Triplane PNG dumps (triplane_decoder.py:186-194)."""
    import matplotlib.pyplot as plt
    os.makedirs(viz_dir, exist_ok=True)
    code_viz = np.asarray(code)
    num_scenes, _, num_chn, h, w = code_viz.shape
    if not flip_z:
        code_viz = code_viz[..., ::-1, :]
    code_viz = code_viz.transpose(0, 1, 3, 2, 4).reshape(
        num_scenes, 3 * h, num_chn * w)
    for cv, name in zip(code_viz, scene_names):
        plt.imsave(os.path.join(viz_dir, f'scene_{name}.png'), cv,
                   vmin=code_range[0], vmax=code_range[1])


def eval_and_viz(model, state, code, density_bitfield, data, viz_dir=None,
                 cfg=None, decoder_params=None):
    """Returns (log_vars, pred_imgs (S, V, 3, h, w))."""
    cfg = cfg if cfg is not None else model.test_cfg
    scene_names = data.get('scene_name',
                           [f'{i:04d}' for i in range(code.shape[0])])
    test_intrinsics = jnp.asarray(data['test_intrinsics'])
    test_poses = jnp.asarray(data['test_poses'])
    S, V = test_poses.shape[:2]

    test_imgs = data.get('test_imgs')
    if test_imgs is not None and not cfg.get('skip_eval', False):
        h, w = test_imgs.shape[2:4]
        target = jnp.asarray(test_imgs).transpose(0, 1, 4, 2, 3).reshape(
            S * V, 3, h, w)
    else:
        target = None
        h, w = cfg['img_size']

    image, depth = model.render(state, code, density_bitfield, h, w,
                                test_intrinsics, test_poses, cfg=cfg,
                                decoder_params=decoder_params)
    pred = jnp.clip(image.transpose(0, 1, 4, 2, 3).reshape(S * V, 3, h, w),
                    0, 1)
    pred = jnp.round(pred * 255) / 255

    log_vars = {}
    psnr_all = ssim_all = lpips_all = None
    if target is not None:
        psnr_all = np.asarray(eval_psnr(pred, target))
        ssim_all = eval_ssim_skimage(pred, target, data_range=1)
        log_vars['test_psnr'] = float(psnr_all.mean())
        log_vars['test_ssim'] = float(ssim_all.mean())
        lp = _try_lpips()
        if lp:
            import torch
            with torch.no_grad():
                vals = []
                p = torch.from_numpy(np.asarray(pred, np.float32))
                t = torch.from_numpy(np.asarray(target, np.float32))
                for i in range(0, len(p), 32):
                    vals.append(lp(p[i:i + 32] * 2 - 1,
                                   t[i:i + 32] * 2 - 1).flatten())
                lpips_all = torch.cat(vals).numpy()
            log_vars['test_lpips'] = float(lpips_all.mean())
        else:
            lp_jax = _jax_lpips(cfg.get('lpips_weights'))
            p = np.asarray(pred, np.float32).transpose(0, 2, 3, 1)
            t = np.asarray(target, np.float32).transpose(0, 2, 3, 1)
            vals = [lp_jax(p[i:i + 32], t[i:i + 32])
                    for i in range(0, len(p), 32)]
            lpips_all = np.concatenate(vals)
            # substitute (random) weights => tagged key: relative-only,
            # not comparable to published VGG-LPIPS numbers
            key = ('test_lpips_substitute'
                   if getattr(lp_jax, 'substitute_weights', False)
                   else 'test_lpips')
            log_vars[key] = float(lpips_all.mean())

    if viz_dir is None:
        viz_dir = cfg.get('viz_dir')
    if viz_dir is not None:
        import matplotlib.pyplot as plt
        os.makedirs(viz_dir, exist_ok=True)
        out_viz = np.asarray(
            jnp.round(pred.transpose(0, 2, 3, 1) * 255)).astype(np.uint8)
        out_viz = out_viz.reshape(S, V, h, w, 3)
        if target is not None:
            real = np.asarray(target).transpose(0, 2, 3, 1).reshape(
                S, V, h, w, 3)
            real = (real * 255).astype(np.uint8)
            out_viz = np.concatenate([real, out_viz], axis=-2)
        test_img_paths = data.get('test_img_paths')
        for si, name in enumerate(scene_names):
            for vi in range(V):
                if test_img_paths is not None and psnr_all is not None:
                    base = 'scene_' + name + '_' + os.path.splitext(
                        os.path.basename(test_img_paths[si][vi]))[0]
                    lp_val = (lpips_all[si * V + vi]
                              if lpips_all is not None else math.nan)
                    fname = base + '_psnr{:02.1f}_ssim{:.2f}_lpips{:.3f}.png'.format(
                        psnr_all[si * V + vi], ssim_all[si * V + vi], lp_val)
                    for f in glob(os.path.join(viz_dir, base + '*.png')):
                        os.remove(f)
                else:
                    fname = f'scene_{name}_{vi:03d}.png'
                plt.imsave(os.path.join(viz_dir, fname), out_viz[si, vi])
        visualize_triplane(code, scene_names, viz_dir,
                           code_range=cfg.get('clip_range', (-1, 1)))
        if state.get('init_code') is not None:
            visualize_triplane(np.asarray(state['init_code'])[None],
                               ['000_mean'], viz_dir,
                               code_range=cfg.get('clip_range', (-1, 1)))

    return log_vars, pred.reshape(S, V, 3, h, w)
