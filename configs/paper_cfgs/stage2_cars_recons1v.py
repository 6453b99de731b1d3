# Two-stage ablation, single-view reconstruction test path.
_base_ = ['stage2_cars_uncond.py']

name = 'stage2_cars_recons1v'
work_dir = 'work_dirs/' + name

model = dict(
    diffusion=dict(
        denoising=dict(dropout=0.1),
        ddpm_loss=dict(weight_scale=1.0)))

test_cfg = dict(
    _delete_=True,
    img_size=(128, 128),
    num_timesteps=75,
    clip_range=[-2, 2],
    density_thresh=0.1,
    dt_gamma_scale=0.5,
    n_inverse_rays=2 ** 14,
    loss_coef=0.1 / (128 * 128),
    guidance_gain=3.2 * (2 ** 14),
    cond_mode='guide_optim',
    n_inverse_steps=25,
    extra_scene_step=3,
    optimizer=dict(type='Adam', lr=0.005, weight_decay=0.),
    lr_scheduler=dict(type='ExponentialLR', gamma=0.998))

total_iters = 80000

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
