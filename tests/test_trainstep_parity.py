"""End-to-end train-step parity against a torch transcription of the
reference's composed training math (tests/torch_trainstep_fixture.py).

Drives `DiffusionNeRF.train_step` (the jitted production step) and the
torch fixture on identical weights, identical inputs and identical random
draws for 3 consecutive steps, and asserts losses, updated codes and the
scale-norm buffer match.  This is the composed-step check the module-level
parity tests cannot give: a sign-flipped loss weight, a wrong Adam
bias-correction placement, a missed prior-grad accumulation or a
norm-factor update-order bug all fail here.

Reference call stack transcribed:
/root/reference/lib/models/autodecoders/diffusion_nerf.py:66-189 (step),
lib/models/diffusions/gaussian_diffusion.py:404-448 (loss),
lib/models/losses/ddpm_loss.py:80-128 (scale_norm),
lib/models/autodecoders/base_nerf.py:276-389 (render loss + grid update).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from flax import serialization  # noqa: E402

from ssdnerf_tpu.registry import build_model  # noqa: E402
from ssdnerf_tpu.models.autodecoders.base import adam_init  # noqa: E402
from tests.synthetic import TINY_MODEL_CFG, make_batch  # noqa: E402
from tests import torch_trainstep_fixture as tf  # noqa: E402

import os
import sys
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))
import convert_checkpoint as cc  # noqa: E402


S = 2
H = W = 16
N_RAYS = 128
LR_DIFF, LR_DEC, LR_CODE = 1e-4, 1e-3, 1e-2


def _model_cfg():
    cfg = dict(TINY_MODEL_CFG)
    cfg['decoder'] = dict(cfg['decoder'], compute_dtype='float32',
                          backend='xla', compact_steps=None)
    return cfg


def _train_cfg():
    return dict(
        dt_gamma_scale=0.5, density_thresh=0.1, extra_scene_step=0,
        n_decoder_rays=N_RAYS, loss_coef=0.1 / (H * W),
        optimizer=dict(type='Adam', lr=LR_CODE, weight_decay=0.))


def _copy_decoder_to_torch(dec_params, tdec):
    p = dec_params['params']
    with torch.no_grad():
        for jname, tmod in [('base_net', tdec.base_net),
                            ('density_net', tdec.density_net),
                            ('dir_net', tdec.dir_net),
                            ('color_net', tdec.color_net)]:
            k = np.asarray(p[jname]['dense_0']['kernel'])
            b = np.asarray(p[jname]['dense_0']['bias'])
            tmod.weight.copy_(torch.from_numpy(k.T.copy()))
            tmod.bias.copy_(torch.from_numpy(b.copy()))


def test_trainstep_parity():
    model = build_model(_model_cfg(), train_cfg=_train_cfg(), test_cfg={})
    tc = model.train_cfg
    opt_cfgs = dict(diffusion=dict(type='Adam', lr=LR_DIFF, weight_decay=0.),
                    decoder=dict(type='Adam', lr=LR_DEC, weight_decay=0.))
    state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
    tx_diff = model.make_optimizer(opt_cfgs['diffusion'], None, 'diffusion')
    tx_dec = model.make_optimizer(opt_cfgs['decoder'], None, 'decoder')

    # ---- torch twins with identical weights ----
    den = dict(TINY_MODEL_CFG['diffusion']['denoising'])
    den.pop('type')
    tunet = tf.__dict__  # noqa (placate linters; fixture reuse below)
    from tests.torch_mmgen_fixture import DenoisingUnetMod
    tunet = DenoisingUnetMod(**den)
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in tunet.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    tunet = tunet.train()
    params, leftover = cc.convert_unet(
        {k: v.numpy() for k, v in tunet.state_dict().items()}, dict(den))
    assert not leftover, leftover[:8]
    state['diffusion'] = serialization.from_state_dict(
        state['diffusion'], params)

    tdec = tf.TorchTriplaneDecoder(C=4, hidden=32)
    _copy_decoder_to_torch(state['decoder'], tdec)

    # ---- identical batch, codes, cache state ----
    data_np = make_batch(num_scenes=S, num_views=2, h=H, w=W, seed=5)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k != 'scene_name'}
    rng = np.random.RandomState(7)
    code0 = model.get_init_code_np(S, rng)
    Hg = model.grid_size
    scene_batch = dict(
        code_=jnp.asarray(code0), opt=adam_init(jnp.asarray(code0)),
        density_grid=jnp.zeros((S, Hg ** 3), jnp.float32),
        density_bitfield=jnp.zeros((S, Hg ** 3 // 8), jnp.uint8))

    rays_o, rays_d, dt_gamma = model.cond_rays(data, tc)
    num_pixels = int(np.prod(data['cond_imgs'].shape[1:4]))

    code_t = torch.tensor(code0, requires_grad=True)
    topt_diff = torch.optim.Adam(tunet.parameters(), lr=LR_DIFF)
    topt_dec = torch.optim.Adam(tdec.parameters(), lr=LR_DEC)
    topt_code = torch.optim.Adam([code_t], lr=LR_CODE)
    sched = dict(
        sqrt_ab=torch.tensor(
            np.asarray(model.diffusion.schedule.sqrt_alphas_bar, np.float32)),
        sqrt_1mab=torch.tensor(np.asarray(
            model.diffusion.schedule.sqrt_one_minus_alphas_bar, np.float32)),
        weight=torch.tensor(np.asarray(
            model.diffusion.timestep_sampler.weight, np.float32)),
        weight_scale=model.diffusion.ddpm_loss.weight_scale,
        momentum=model.diffusion.ddpm_loss.momentum,
        norm_factor=1.0)
    tbatch = dict(
        rays_o=torch.tensor(np.asarray(rays_o)),
        rays_d=torch.tensor(np.asarray(rays_d)),
        imgs=torch.tensor(np.asarray(data['cond_imgs'])),
        dt_gamma=torch.tensor(np.asarray(dt_gamma)),
        density_grid=torch.zeros((S, Hg ** 3)),
        num_pixels=num_pixels)
    tcfg = dict(
        code_scale=float(TINY_MODEL_CFG['code_activation']['scale']),
        code_reshape=TINY_MODEL_CFG['code_reshape'], grid_size=Hg,
        density_thresh=tc['density_thresh'], max_steps=model.decoder.max_steps,
        bg_color=1.0, loss_coef=tc['loss_coef'],
        pixel_loss_weight=TINY_MODEL_CFG['pixel_loss']['loss_weight'],
        reg_loss_weight=TINY_MODEL_CFG['reg_loss']['loss_weight'])

    step = jax.jit(
        lambda s, b, d, k: model.train_step(s, b, d, k, tx_diff, tx_dec))

    def mirror_draws(key):
        """Replicate train_step's key discipline and draw the same values
        it will consume (diffusion_nerf.py train_step + forward_train +
        update_density_grid + ray_sample + volume_render)."""
        (_, _, k_diff, _, _, k_upd, k_ray, k_pert) = jax.random.split(key, 8)
        t_key, n_key = jax.random.split(k_diff)
        t = model.diffusion.timestep_sampler.sample(t_key, S)
        noise = jax.random.normal(
            n_key, (S,) + tuple(TINY_MODEL_CFG['code_reshape']))
        half = model.decoder.bound / Hg
        lin = jnp.arange(Hg ** 3, dtype=jnp.int32)
        coords = jnp.stack(
            [lin // (Hg * Hg), (lin // Hg) % Hg, lin % Hg], -1)
        jitter = jax.random.uniform(
            k_upd, coords.shape + tuple(), minval=-half, maxval=half)
        P = num_pixels
        keys = jax.random.split(k_ray, S)
        ray_inds = jax.vmap(
            lambda k: jax.random.permutation(k, P)[:N_RAYS])(keys)
        perturb = jax.random.uniform(k_pert, (S, N_RAYS))
        return dict(
            t=torch.tensor(np.asarray(t, np.int64)),
            noise=torch.tensor(np.asarray(noise, np.float32)),
            density_jitter=torch.tensor(np.asarray(jitter, np.float32)),
            ray_inds=torch.tensor(np.asarray(ray_inds, np.int64)),
            perturb=torch.tensor(np.asarray(perturb, np.float32)))

    key = jax.random.PRNGKey(11)
    # Adam's first update is ~±lr * sign(g) for ANY g, so code entries
    # whose accumulated gradient sits below fp noise (~1e-6; both
    # implementations legitimately disagree on its sign there) can differ
    # by up to 2*lr.  Those entries are excluded (cumulatively) from the
    # code comparison and asserted to be a small minority.
    fragile = np.zeros(code0.shape, bool)
    for i in range(3):
        key, sub = jax.random.split(key)
        rand = mirror_draws(sub)
        state, scene_batch, logs = step(state, scene_batch, data, sub)
        tlogs = tf.torch_train_step(
            tunet, tdec, code_t, topt_diff, topt_dec, topt_code,
            sched, rand, tbatch, tcfg)

        for name in ('loss_diffusion', 'loss_decoder', 'pixel_loss',
                     'reg_loss'):
            np.testing.assert_allclose(
                float(logs[name]), tlogs[name], rtol=1e-4, atol=1e-5,
                err_msg=f'step {i}: {name}')
        np.testing.assert_allclose(
            float(logs['train_psnr']), tlogs['train_psnr'], atol=0.05,
            err_msg=f'step {i}: train_psnr')
        np.testing.assert_allclose(
            float(state['ddpm_loss'][0]), sched['norm_factor'], rtol=1e-5,
            err_msg=f'step {i}: scale-norm buffer')
        g_abs = np.abs(tlogs['code_grad'].numpy())
        fragile |= g_abs < 1e-5
        assert fragile.mean() < 0.35, 'too many unresolvable-gradient entries'
        diff = np.abs(np.asarray(scene_batch['code_'])
                      - code_t.detach().numpy())
        # Adam normalizes by |g|, so fp noise (~2e-6 between the two
        # renderer implementations) produces an update error ~ lr*noise/|g|
        # per step — a continuum, not a mask.  The bound below passes that
        # legitimate amplification but still catches any systematic
        # relative error (a wrong bias correction, a sign flip, a missed
        # grad accumulation shifts updates by ~lr at EVERY |g| and blows
        # the 1e-4 floor at healthy gradients).
        tol = 1e-4 + LR_CODE * (i + 1) * 5e-6 / np.maximum(g_abs, 1e-12)
        bad = (diff > tol) & ~fragile
        assert not bad.any(), (
            f'step {i}: {bad.sum()} code entries beyond tolerance, worst '
            f'diff {diff[bad].max():.2e} at |g| {g_abs[bad].max():.2e}')
        # re-sync the unresolvable entries so their +-lr sign-flip
        # divergence cannot contaminate the next step's comparison
        with torch.no_grad():
            mask = torch.from_numpy(fragile)
            code_t.data[mask] = torch.from_numpy(
                np.asarray(scene_batch['code_']))[mask]
        np.testing.assert_allclose(
            np.asarray(scene_batch['density_bitfield']),
            tlogs['bitfield'].numpy(), err_msg=f'step {i}: bitfield')


def test_trainstep_parity_extra_scene_step():
    """Composed-step parity WITH the flagship's inner scene loop
    (extra_scene_step=3, update_extra_interval=2 so a density-grid
    update fires MID-scan at inner step 2): the prior-grad injection
    through inverse_code's lax.scan (base_nerf.py:403-492 driven by
    diffusion_nerf.py:128-158) against a step-by-step torch
    transcription.  Asserts losses, codes, per-scene Adam moments and
    the density bitfield over 2 outer steps."""
    ESS, INTERVAL, N_INNER = 3, 2, 128
    cfg = _model_cfg()
    cfg['update_extra_interval'] = INTERVAL
    tc = _train_cfg()
    tc.update(extra_scene_step=ESS, n_inverse_rays=N_INNER)
    model = build_model(cfg, train_cfg=tc, test_cfg={})
    tc = model.train_cfg
    opt_cfgs = dict(diffusion=dict(type='Adam', lr=LR_DIFF, weight_decay=0.),
                    decoder=dict(type='Adam', lr=LR_DEC, weight_decay=0.))
    state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
    tx_diff = model.make_optimizer(opt_cfgs['diffusion'], None, 'diffusion')
    tx_dec = model.make_optimizer(opt_cfgs['decoder'], None, 'decoder')

    den = dict(TINY_MODEL_CFG['diffusion']['denoising'])
    den.pop('type')
    from tests.torch_mmgen_fixture import DenoisingUnetMod
    tunet = DenoisingUnetMod(**den)
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in tunet.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    tunet = tunet.train()
    params, leftover = cc.convert_unet(
        {k: v.numpy() for k, v in tunet.state_dict().items()}, dict(den))
    assert not leftover, leftover[:8]
    state['diffusion'] = serialization.from_state_dict(
        state['diffusion'], params)

    tdec = tf.TorchTriplaneDecoder(C=4, hidden=32)
    _copy_decoder_to_torch(state['decoder'], tdec)

    data_np = make_batch(num_scenes=S, num_views=2, h=H, w=W, seed=5)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k != 'scene_name'}
    rng = np.random.RandomState(7)
    code0 = model.get_init_code_np(S, rng)
    Hg = model.grid_size
    scene_batch = dict(
        code_=jnp.asarray(code0), opt=adam_init(jnp.asarray(code0)),
        density_grid=jnp.zeros((S, Hg ** 3), jnp.float32),
        density_bitfield=jnp.zeros((S, Hg ** 3 // 8), jnp.uint8))

    rays_o, rays_d, dt_gamma = model.cond_rays(data, tc)
    num_pixels = int(np.prod(data['cond_imgs'].shape[1:4]))

    code_t = torch.tensor(code0, requires_grad=True)
    topt_diff = torch.optim.Adam(tunet.parameters(), lr=LR_DIFF)
    topt_dec = torch.optim.Adam(tdec.parameters(), lr=LR_DEC)
    topt_code = torch.optim.Adam([code_t], lr=LR_CODE)
    sched = dict(
        sqrt_ab=torch.tensor(
            np.asarray(model.diffusion.schedule.sqrt_alphas_bar, np.float32)),
        sqrt_1mab=torch.tensor(np.asarray(
            model.diffusion.schedule.sqrt_one_minus_alphas_bar, np.float32)),
        weight=torch.tensor(np.asarray(
            model.diffusion.timestep_sampler.weight, np.float32)),
        weight_scale=model.diffusion.ddpm_loss.weight_scale,
        momentum=model.diffusion.ddpm_loss.momentum,
        norm_factor=1.0)
    tbatch = dict(
        rays_o=torch.tensor(np.asarray(rays_o)),
        rays_d=torch.tensor(np.asarray(rays_d)),
        imgs=torch.tensor(np.asarray(data['cond_imgs'])),
        dt_gamma=torch.tensor(np.asarray(dt_gamma)),
        density_grid=torch.zeros((S, Hg ** 3)),
        num_pixels=num_pixels)
    tcfg = dict(
        code_scale=float(TINY_MODEL_CFG['code_activation']['scale']),
        code_reshape=TINY_MODEL_CFG['code_reshape'], grid_size=Hg,
        density_thresh=tc['density_thresh'], max_steps=model.decoder.max_steps,
        bg_color=1.0, loss_coef=tc['loss_coef'],
        pixel_loss_weight=TINY_MODEL_CFG['pixel_loss']['loss_weight'],
        reg_loss_weight=TINY_MODEL_CFG['reg_loss']['loss_weight'])

    step = jax.jit(
        lambda s, b, d, k: model.train_step(s, b, d, k, tx_diff, tx_dec))

    half = model.decoder.bound / Hg
    P = num_pixels
    from ssdnerf_tpu.models.autodecoders.base import make_raybatch_indices

    def mirror_draws(key):
        """Replicate train_step's key discipline INCLUDING inverse_code's:
        key->(8) as in the ess=0 mirror, then within k_inv:
        (key, bkey) = split; raybatch indices from bkey; per inner step
        (key, ukey, skey, pkey, dkey) = split(key, 5)."""
        (_, _, k_diff, _, k_inv, k_upd, k_ray, k_pert) = \
            jax.random.split(key, 8)
        t_key, n_key = jax.random.split(k_diff)
        t = model.diffusion.timestep_sampler.sample(t_key, S)
        noise = jax.random.normal(
            n_key, (S,) + tuple(TINY_MODEL_CFG['code_reshape']))

        # ---- inner loop draws (inverse_code) ----
        k, bkey = jax.random.split(k_inv)
        inds = make_raybatch_indices(bkey, S, P, N_INNER, ESS)
        assert inds is not None
        inner = []
        for i in range(ESS):
            k, ukey, skey, pkey, dkey = jax.random.split(k, 5)
            lin = jnp.arange(Hg ** 3, dtype=jnp.int32)
            coords = jnp.stack(
                [lin // (Hg * Hg), (lin // Hg) % Hg, lin % Hg], -1)
            jitter = jax.random.uniform(
                ukey, coords.shape, minval=-half, maxval=half)
            perturb = jax.random.uniform(pkey, (S, N_INNER))
            inner.append(dict(
                density_jitter=torch.tensor(np.asarray(jitter, np.float32)),
                ray_inds=torch.tensor(np.asarray(inds[i], np.int64)),
                perturb=torch.tensor(np.asarray(perturb, np.float32))))

        # ---- final joint-step draws ----
        lin = jnp.arange(Hg ** 3, dtype=jnp.int32)
        coords = jnp.stack(
            [lin // (Hg * Hg), (lin // Hg) % Hg, lin % Hg], -1)
        jitter = jax.random.uniform(
            k_upd, coords.shape, minval=-half, maxval=half)
        keys = jax.random.split(k_ray, S)
        ray_inds = jax.vmap(
            lambda kk: jax.random.permutation(kk, P)[:N_RAYS])(keys)
        perturb = jax.random.uniform(k_pert, (S, N_RAYS))
        return dict(
            t=torch.tensor(np.asarray(t, np.int64)),
            noise=torch.tensor(np.asarray(noise, np.float32)),
            density_jitter=torch.tensor(np.asarray(jitter, np.float32)),
            ray_inds=torch.tensor(np.asarray(ray_inds, np.int64)),
            perturb=torch.tensor(np.asarray(perturb, np.float32))), inner

    key = jax.random.PRNGKey(11)
    fragile = np.zeros(code0.shape, bool)
    adam_steps = 0
    for i in range(2):
        key, sub = jax.random.split(key)
        rand, inner_rand = mirror_draws(sub)
        state, scene_batch, logs = step(state, scene_batch, data, sub)
        tlogs = tf.torch_train_step(
            tunet, tdec, code_t, topt_diff, topt_dec, topt_code,
            sched, rand, tbatch, tcfg,
            inner_rand=inner_rand, update_extra_interval=INTERVAL)
        adam_steps += ESS + 1

        for name in ('loss_diffusion', 'loss_decoder', 'pixel_loss',
                     'reg_loss'):
            np.testing.assert_allclose(
                float(logs[name]), tlogs[name], rtol=2e-4, atol=1e-5,
                err_msg=f'outer step {i}: {name}')
        np.testing.assert_allclose(
            float(state['ddpm_loss'][0]), sched['norm_factor'], rtol=1e-5,
            err_msg=f'outer step {i}: scale-norm buffer')

        # An entry is unresolvable only where its gradient sits below fp
        # noise (~3e-6: there the +-lr Adam first-update sign itself is
        # implementation-dependent); entries above that are covered by the
        # amplification-aware tolerance, whose denominator must be the
        # MINIMUM |g| the entry saw across this outer step's ESS+1 Adam
        # steps (the worst amplification it went through).
        all_grads = np.stack([g.numpy() for g in tlogs['code_grads']]
                             + [tlogs['code_grad'].numpy()])
        g_min = np.abs(all_grads).min(0)
        fragile |= g_min < 3e-6
        assert fragile.mean() < 0.35, 'too many unresolvable-gradient entries'

        diff = np.abs(np.asarray(scene_batch['code_'])
                      - code_t.detach().numpy())
        tol = 1e-4 + LR_CODE * adam_steps * 5e-6 / np.maximum(g_min, 1e-12)
        bad = (diff > tol) & ~fragile
        assert not bad.any(), (
            f'outer step {i}: {bad.sum()} code entries beyond tolerance, '
            f'worst diff {diff[bad].max():.2e}')

        # per-scene Adam moments (m, v, step) of the code optimizer
        tstate = topt_code.state[code_t]
        np.testing.assert_allclose(
            np.asarray(scene_batch['opt'].m), tstate['exp_avg'].numpy(),
            atol=2e-5, err_msg=f'outer step {i}: Adam m')
        np.testing.assert_allclose(
            np.asarray(scene_batch['opt'].v), tstate['exp_avg_sq'].numpy(),
            atol=2e-7, err_msg=f'outer step {i}: Adam v')
        assert int(np.asarray(scene_batch['opt'].step)[0]) \
            == int(tstate['step'])

        with torch.no_grad():
            mask = torch.from_numpy(fragile)
            code_t.data[mask] = torch.from_numpy(
                np.asarray(scene_batch['code_']))[mask]
            tstate['exp_avg'][mask] = torch.from_numpy(
                np.asarray(scene_batch['opt'].m))[mask]
            tstate['exp_avg_sq'][mask] = torch.from_numpy(
                np.asarray(scene_batch['opt'].v))[mask]
        np.testing.assert_allclose(
            np.asarray(scene_batch['density_bitfield']),
            tlogs['bitfield'].numpy(), err_msg=f'outer step {i}: bitfield')
