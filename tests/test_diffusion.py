"""Tests for schedules, timestep samplers, losses, UNet and samplers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssdnerf_tpu.models.diffusions import make_schedule, build_timestep_sampler
from ssdnerf_tpu.models.diffusions.gaussian_diffusion import GaussianDiffusion
from ssdnerf_tpu.models.losses import build_ddpm_loss, MSELoss, RegLoss, TVLoss
from ssdnerf_tpu.models.architecture.unet import DenoisingUnet


TINY_DIFFUSION_CFG = dict(
    type='GaussianDiffusion',
    num_timesteps=20,
    betas_cfg=dict(type='linear'),
    denoising=dict(
        type='DenoisingUnetMod',
        image_size=16,
        in_channels=6,
        base_channels=32,
        channels_cfg=[1, 2],
        resblocks_per_downsample=1,
        dropout=0.0,
        use_scale_shift_norm=True,
        downsample_conv=True,
        upsample_conv=True,
        num_heads=2,
        attention_res=[8]),
    timestep_sampler=dict(type='SNRWeightedTimeStepSampler', power=0.5),
    ddpm_loss=dict(
        type='DDPMMSELossMod',
        rescale_mode='timestep_weight',
        log_cfgs=dict(type='quartile', prefix_name='loss_mse',
                      total_timesteps=20),
        data_info=dict(pred='v_t_pred', target='v_t'),
        weight_scale=4.0,
        scale_norm=True))


def test_schedule_math():
    sch = make_schedule(dict(type='linear'), 1000)
    # linear: scale = 1000/1000 = 1
    assert sch.betas[0] == pytest.approx(1e-4)
    assert sch.betas[-1] == pytest.approx(2e-2)
    np.testing.assert_allclose(sch.alphas_bar,
                               np.cumprod(1 - sch.betas), rtol=1e-12)
    # posterior variance identity: tilde_beta_t = beta_t(1-abar_{t-1})/(1-abar_t)
    t = 500
    expected = sch.betas[t] * (1 - sch.alphas_bar[t - 1]) / (1 - sch.alphas_bar[t])
    assert sch.tilde_betas_t[t] == pytest.approx(expected)
    # cosine schedule is valid
    sch2 = make_schedule(dict(type='cosine'), 100)
    assert np.all(sch2.betas > 0) and np.all(sch2.betas <= 0.999)


def test_snr_weighted_sampler():
    sch = make_schedule(dict(type='linear'), 1000)
    s = build_timestep_sampler(
        dict(type='SNRWeightedTimeStepSampler', power=0.5), sch, 'V')
    mean, std = sch.sqrt_alphas_bar, sch.sqrt_one_minus_alphas_bar
    expected = (mean / std) ** 1 * std ** 2  # sqrt(SNR) * std^2
    np.testing.assert_allclose(s.weight, expected, rtol=1e-6)
    np.testing.assert_allclose(s.prob, 1.0 / 1000)
    t = s.sample(jax.random.PRNGKey(0), 64)
    assert t.shape == (64,) and int(t.min()) >= 0 and int(t.max()) < 1000


def test_ddpm_loss_scale_norm():
    sch = make_schedule(dict(type='linear'), 10)
    sampler = build_timestep_sampler(dict(type='UniformTimeStepSampler'),
                                     sch, 'V')
    loss_mod = build_ddpm_loss(
        dict(type='DDPMMSELossMod', rescale_mode='timestep_weight',
             weight_scale=2.0, scale_norm=True, momentum=0.5,
             log_cfgs=dict(type='quartile')), sampler, 10)
    state = loss_mod.init_state()
    pred = jnp.ones((4, 2, 3, 3))
    target = jnp.zeros_like(pred)
    x0 = 2.0 * jnp.ones_like(pred)
    t = jnp.array([0, 3, 6, 9])
    loss, new_state, logs = loss_mod(pred, target, t, x0, state,
                                     update_norm=True)
    # norm EMA: 0.5*1 + 0.5*mean(x0^2)=0.5+2=2.5
    assert float(new_state[0]) == pytest.approx(2.5, rel=1e-5)
    # per-sample 0.5*1*w(=1)*2 = 1 -> mean 1; divided by the UPDATED norm
    # (reference updates the buffer before dividing, ddpm_loss.py:91-113)
    assert float(loss) == pytest.approx(1.0 / 2.5, rel=1e-5)
    assert 'loss_ddpm_mse' in logs and 'loss_mse_quartile_0' in logs


def test_unet_shapes_and_grouped_variant():
    unet = DenoisingUnet(image_size=(16, 16), in_channels=6, base_channels=32,
                         channels_cfg=(1, 2), resblocks_per_downsample=1,
                         num_heads=2, attention_res=(8,))
    x = jnp.zeros((2, 16, 16, 6))
    t = jnp.array([0, 5])
    params = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(params, x, t)
    assert out.shape == (2, 16, 16, 6)
    # grouped (tiled-triplane) variant
    unet_g = DenoisingUnet(image_size=(8, 24), in_channels=6, base_channels=48,
                           channels_cfg=(1, 2), resblocks_per_downsample=1,
                           num_heads=2, groups=3, attention_res=(4,),
                           norm_groups=24)
    xg = jnp.zeros((1, 8, 24, 6))
    params_g = unet_g.init(jax.random.PRNGKey(1), xg, jnp.array([3]))
    assert unet_g.apply(params_g, xg, jnp.array([3])).shape == (1, 8, 24, 6)
    # concat-cond variant
    unet_c = DenoisingUnet(image_size=(16, 16), in_channels=6,
                           concat_cond_channels=3, base_channels=32,
                           channels_cfg=(1, 2), resblocks_per_downsample=1,
                           num_heads=2, attention_res=(8,))
    cond = jnp.zeros((2, 16, 16, 3))
    params_c = unet_c.init(jax.random.PRNGKey(2), x, t, concat_cond=cond)
    assert unet_c.apply(params_c, x, t, concat_cond=cond).shape == (2, 16, 16, 6)


@pytest.fixture(scope='module')
def tiny_diffusion():
    diff = GaussianDiffusion.from_cfg(TINY_DIFFUSION_CFG)
    params = diff.init_params(jax.random.PRNGKey(0))
    return diff, params


def test_forward_train_and_v_target(tiny_diffusion):
    diff, params = tiny_diffusion
    x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16, 16))
    state = diff.ddpm_loss.init_state()
    loss, new_state, logs = diff.forward_train(
        params, x0, jax.random.PRNGKey(2), state)
    assert np.isfinite(float(loss))
    assert float(new_state[0]) != 1.0  # norm updated
    # gradients flow to unet params
    g = jax.grad(lambda p: diff.forward_train(
        p, x0, jax.random.PRNGKey(2), state)[0])(params)
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert np.isfinite(np.array(leaf)).all()


def test_q_sample_statistics(tiny_diffusion):
    diff, _ = tiny_diffusion
    x0 = jnp.ones((1, 6, 16, 16))
    t = jnp.array([10])
    noise = jnp.zeros_like(x0)
    x_t, mean, std = diff.q_sample(x0, t, noise)
    np.testing.assert_allclose(
        np.array(x_t)[0, 0, 0, 0], diff.schedule.sqrt_alphas_bar[10],
        rtol=1e-6)


def test_ddim_sample_runs_and_terminates(tiny_diffusion):
    diff, params = tiny_diffusion
    noise = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 16, 16))
    out, _ = diff.ddim_sample(params, noise, jax.random.PRNGKey(4),
                              cfg=dict(num_timesteps=5, clip_range=[-2, 2]))
    assert out.shape == noise.shape
    assert np.isfinite(np.array(out)).all()
    # DDPM ancestral sampling too
    out2, _ = diff.ddpm_sample(params, noise, jax.random.PRNGKey(5),
                               cfg=dict(num_timesteps=5))
    assert np.isfinite(np.array(out2)).all()


def test_ddim_guidance_moves_sample(tiny_diffusion):
    """Reconstruction guidance: guiding towards zero shrinks the output."""
    diff, params = tiny_diffusion
    noise = jax.random.normal(jax.random.PRNGKey(6), (1, 6, 16, 16))

    def guide(x0_pred, state):
        return (x0_pred ** 2).sum(), state + 1

    cfg = dict(num_timesteps=5, clip_range=[-2, 2], guidance_gain=0.05)
    base, _ = diff.ddim_sample(params, noise, jax.random.PRNGKey(7), cfg=cfg)
    guided, nsteps = diff.ddim_sample(
        params, noise, jax.random.PRNGKey(7), cfg=cfg,
        grad_guide_fn=guide, guide_state=jnp.zeros(()))
    assert int(nsteps) == 5  # guide state threaded through every step
    assert float(jnp.abs(guided).mean()) < float(jnp.abs(base).mean())


def test_timestep_seq_matches_torch_arange(tiny_diffusion):
    diff, _ = tiny_diffusion
    ts, tp = diff._timestep_seq(dict(num_timesteps=3))
    # torch.arange(19, -1, -20/3).long() -> [19, 12, 5]
    np.testing.assert_array_equal(ts, [19, 12, 5])
    np.testing.assert_array_equal(tp, [12, 5, -1])


def test_simple_losses():
    assert float(MSELoss(2.0)(jnp.ones(4), jnp.zeros(4))) == pytest.approx(2.0)
    assert float(RegLoss(power=2, loss_weight=3.0)(2 * jnp.ones(5))) == \
        pytest.approx(12.0)
    tv = TVLoss(dims=(-2, -1), power=2, loss_weight=1.0)
    x = jnp.arange(9.0).reshape(1, 3, 3)
    assert float(tv(x)) > 0


def test_unet_bf16_dtype():
    unet = DenoisingUnet(image_size=(16, 16), in_channels=6, base_channels=32,
                         channels_cfg=(1, 2), resblocks_per_downsample=1,
                         num_heads=2, attention_res=(8,), dtype='bfloat16')
    x = jnp.ones((1, 16, 16, 6))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.array([1]))
    out = unet.apply(params, x, jnp.array([1]))
    assert out.dtype == jnp.float32  # output upcast
    assert np.isfinite(np.array(out)).all()
    # params stay f32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32
    # close to the f32 UNet with the same params
    unet32 = DenoisingUnet(image_size=(16, 16), in_channels=6,
                           base_channels=32, channels_cfg=(1, 2),
                           resblocks_per_downsample=1, num_heads=2,
                           attention_res=(8,))
    out32 = unet32.apply(params, x, jnp.array([1]))
    np.testing.assert_allclose(np.array(out), np.array(out32), atol=0.1)
