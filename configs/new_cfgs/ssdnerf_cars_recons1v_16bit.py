# 16-bit cache + normalized-tanh recons1v variant.
_base_ = ['ssdnerf_cars_uncond_16bit.py']

name = 'ssdnerf_cars_recons1v_16bit'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

model = dict(diffusion=dict(denoising=dict(dropout=0.0)))

train_cfg = dict(
    optimizer=dict(lr=1e-2),
    cache_load_from=code_dir)
test_cfg = dict(
    _delete_=True,
    img_size=(128, 128),
    num_timesteps=75,
    clip_range=[-2, 2],
    density_thresh=0.1,
    dt_gamma_scale=0.5,
    n_inverse_rays=2 ** 14,
    override_cfg={'diffusion_ema.ddpm_loss.weight_scale': 5.0},
    loss_coef=0.1 / (128 * 128),
    guidance_gain=2.2 * (2 ** 14),
    cond_mode='guide_optim',
    n_inverse_steps=25,
    extra_scene_step=3,
    optimizer=dict(type='Adam', lr=0.005, weight_decay=0.),
    lr_scheduler=dict(type='ExponentialLR', gamma=0.998))

lr_config = dict(
    _delete_=True,
    policy='Fixed',
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=0.001)

evaluation = [
    dict(
        type='GenerativeEvalHook3D',
        data='val_cond',
        interval=20000,
        feed_batch_size=32,
        viz_step=32,
        metrics=dict(
            type='FID',
            num_images=704 * 250,
            inception_pkl='work_dirs/cache/cars_test_inception_stylegan.pkl',
            inception_args=dict(
                type='StyleGAN',
                inception_path='work_dirs/cache/inception-2015-12-05.pt'),
            bgr2rgb=False),
        viz_dir=work_dir + '/viz_cond',
        save_best_ckpt=False)]

total_iters = 80000
