"""End-to-end guided reconstruction on real TPU hardware.

Validates SURVEY hard part #3 on silicon: single-view reconstruction via
reconstruction-GUIDED DDIM sampling (renderer inside the sampler scan,
diffusion_nerf.py:241-311) followed by optimization finetuning
(diffusion_nerf.py:313-404) — the `guide_optim` test path behind 3 of the
5 BASELINE.json workloads — and records wall-clock + scenes/s.

Protocol: train single-stage on 8 synthetic sphere scenes (the
validate_diffusion_learning.py recipe), then reconstruct 4 HELD-OUT sphere
scenes from ONE conditioning view each and score PSNR on 5 novel views.
The no-guidance control runs the same DDIM sampler from the same noise
with the guide disabled: guided reconstruction must beat it decisively
(the control renders *a* sphere from the learned prior, not *the* sphere).
"""
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, 'tests'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

import numpy as np
import jax.numpy as jnp

from ssdnerf_tpu.config import Config
from ssdnerf_tpu.registry import build_model
from ssdnerf_tpu.models.autodecoders.base import adam_init
from ssdnerf_tpu.runner.hooks import EMAHook
from ssdnerf_tpu.core.metrics import eval_psnr
from synthetic import make_sphere_batch


def main(train_iters=800):
    base = Config.fromfile(
        _repo + '/configs/paper_cfgs/ssdnerf_cars_uncond.py')
    tc = dict(base.train_cfg, extra_scene_step=3, loss_coef=0.1 / (64 * 64))
    tc.pop('cache_load_from', None)
    S, V = 8, 6
    # guide/optim hyperparameters follow ssdnerf_cars_recons1v.py's
    # test_cfg, scaled to the 4096-ray batches used here
    test_cfg = dict(base.test_cfg, num_timesteps=75, img_size=(64, 64),
                    loss_coef=0.1 / (64 * 64), n_inverse_rays=4096,
                    n_inverse_steps=25, extra_scene_step=3,
                    dt_gamma_scale=0.5,
                    optimizer=dict(type='Adam', lr=5e-3),
                    lr_scheduler=dict(type='ExponentialLR', gamma=0.998),
                    guidance_gain=3.2 * 4096,
                    # the reference's finetuning prior weight (c'_diff = 1,
                    # recons1v test_cfg override_cfg); without it the
                    # training-time weight_scale=4 over-weights the prior
                    # 4x during optim and drags codes toward the prior mean
                    override_cfg={
                        'diffusion_ema.ddpm_loss.weight_scale': 1.0},
                    cond_mode='guide_optim')
    test_cfg.pop('march_slots', None)  # untrained grids are unpruned
    model = build_model(dict(base.model, cache_size=S), train_cfg=tc,
                        test_cfg=test_cfg)

    # ---------------- stage 0: quick single-stage training -------------
    # ss=4 anti-aliases the ground truth (hard silhouettes alone cap
    # novel-view PSNR at ~21 dB regardless of recon quality); texture
    # adds the latitude-band family (VERDICT r4 #9 "higher-texture")
    data_np = make_sphere_batch(num_scenes=S, num_views=V, h=64, w=64,
                                ss=4, texture=True)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k != 'scene_name'}
    opt_cfgs = dict(diffusion=dict(type='Adam', lr=2e-4),
                    decoder=dict(type='Adam', lr=1e-3))
    state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
    tx_d = model.make_optimizer(opt_cfgs['diffusion'], None, 'x')
    tx_dec = model.make_optimizer(opt_cfgs['decoder'], None, 'x')
    rng = np.random.RandomState(0)
    code_ = jnp.asarray(model.get_init_code_np(S, rng))
    batch = dict(code_=code_, opt=adam_init(code_),
                 density_grid=jnp.zeros((S, 64 ** 3), jnp.float16),
                 density_bitfield=jnp.full((S, 64 ** 3 // 8), 255,
                                           jnp.uint8))
    step = jax.jit(lambda s, b, d, k: model.train_step(s, b, d, k,
                                                       tx_d, tx_dec))

    class R:
        iteration = 0
    ema = EMAHook(momentum_cfg=dict(ema_kimg=4, ema_rampup=0.05,
                                    batch_size=S))
    r = R()
    r.state = state
    t0 = time.time()
    for i in range(train_iters):
        r.state, batch, logs = step(
            r.state, batch, data, jax.random.fold_in(jax.random.PRNGKey(1),
                                                     i))
        r.iteration = i + 1
        ema.after_train_iter(r)
        if i % 200 == 0:
            print('train iter %d psnr=%.2f ddpm=%.4f (%.2f it/s)' % (
                i, float(logs['train_psnr']), float(logs['loss_ddpm_mse']),
                (i + 1) / (time.time() - t0)), flush=True)
    state = r.state
    print(f'training done in {time.time() - t0:.0f}s', flush=True)

    # ---------------- held-out single-view reconstruction --------------
    S_test = 4
    held_np = make_sphere_batch(num_scenes=S_test, num_views=V, h=64, w=64,
                                seed=99, ss=4, texture=True)
    recon_data = dict(
        cond_imgs=jnp.asarray(held_np['cond_imgs'][:, :1]),
        cond_poses=jnp.asarray(held_np['cond_poses'][:, :1]),
        cond_intrinsics=jnp.asarray(held_np['cond_intrinsics'][:, :1]))
    test_imgs = held_np['cond_imgs'][:, 1:]
    test_poses = jnp.asarray(held_np['cond_poses'][:, 1:])
    test_intr = jnp.asarray(held_np['cond_intrinsics'][:, 1:])
    noise = jax.random.normal(jax.random.PRNGKey(42),
                              (S_test,) + model.code_size)
    recon_data['noise'] = noise

    def psnr_of(code, bitfield):
        img, _ = model.render(state, code, bitfield, 64, 64, test_intr,
                              test_poses)
        pred = np.clip(np.asarray(img), 0, 1)
        return float(np.asarray(eval_psnr(
            jnp.asarray(pred.reshape(-1, 64, 64, 3).transpose(0, 3, 1, 2)),
            jnp.asarray(test_imgs.reshape(-1, 64, 64, 3).transpose(
                0, 3, 1, 2)))).mean()), pred

    results = {}

    def run_mode(tag, fn):
        out = fn()                                   # compile + run
        jax.block_until_ready(out[0])
        t0 = time.time()
        out = fn()
        _ = np.asarray(out[0])                       # forced readback
        dt = time.time() - t0
        psnr, pred = psnr_of(out[0], out[2])
        print(f'{tag}: PSNR {psnr:.2f} dB on {S_test * (V - 1)} novel '
              f'views | {dt:.2f} s / batch-{S_test} = '
              f'{S_test / dt:.2f} scenes/s', flush=True)
        results[tag] = (psnr, dt, pred)

    key = jax.random.PRNGKey(5)
    model.eval_mode()   # applies test_cfg.override_cfg (weight_scale=1)
    run_mode('uncond control (no guidance)',
             lambda: model.val_uncond(state, noise, key))

    model.test_cfg['cond_mode'] = 'guide'
    run_mode('guide (DDIM-50 + render guide)',
             lambda: model.val_step(state, recon_data, key))

    model.test_cfg['cond_mode'] = 'guide_optim'
    run_mode('guide_optim (guided DDIM + 25-step optim)',
             lambda: model.val_step(state, recon_data, key))

    # diagnostic ceiling: same optim budget but supervised by ALL views —
    # novel-view PSNR above this is unreachable for 1-view recon
    if os.environ.get('RECON_CEILING', '1') == '1':
        all_view_data = dict(
            cond_imgs=jnp.asarray(held_np['cond_imgs']),
            cond_poses=jnp.asarray(held_np['cond_poses']),
            cond_intrinsics=jnp.asarray(held_np['cond_intrinsics']),
            noise=noise)
        model.test_cfg['cond_mode'] = 'guide_optim'
        run_mode('all-view guide_optim (ceiling)',
                 lambda: model.val_step(state, all_view_data, key))

    base_psnr = results['uncond control (no guidance)'][0]
    g_psnr = results['guide (DDIM-50 + render guide)'][0]
    go_psnr = results['guide_optim (guided DDIM + 25-step optim)'][0]
    assert g_psnr > base_psnr + 2.0, (g_psnr, base_psnr)
    assert go_psnr > base_psnr + 2.0, (go_psnr, base_psnr)
    assert go_psnr >= g_psnr - 0.5, (go_psnr, g_psnr)
    target = float(os.environ.get('RECON_TARGET_DB', '20'))
    assert go_psnr >= target, (
        f'guide_optim novel-view PSNR {go_psnr:.2f} dB < {target} dB '
        f'(VERDICT r4 #9 bar)')
    print(f'OK: guided reconstruction beats the no-guidance control by '
          f'{go_psnr - base_psnr:.1f} dB '
          f'(guide {g_psnr:.2f}, guide_optim {go_psnr:.2f}, '
          f'control {base_psnr:.2f})', flush=True)

    try:
        import imageio
        row = np.concatenate(
            [results[k][2].reshape(S_test, V - 1, 64, 64, 3)[:, 0]
             for k in results], axis=1)
        imageio.imwrite('/tmp/guided_recon.png',
                        (np.concatenate(list(row), axis=1) * 255
                         ).astype(np.uint8))
        print('wrote /tmp/guided_recon.png', flush=True)
    except Exception:
        pass


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 800)
