# Two-stage ablation: train the diffusion prior on frozen stage-1 codes.
_base_ = ['ssdnerf_cars_uncond.py']

name = 'stage2_cars_uncond'
work_dir = 'work_dirs/' + name

model = dict(
    freeze_decoder=True,
    init_from_mean=True,
    pretrained='work_dirs/stage1_cars_recons16v/ckpt/latest.ckpt')

train_cfg = dict(_delete_=True, viz_dir=None)
test_cfg = dict(
    _delete_=True,
    img_size=(128, 128),
    num_timesteps=50,
    clip_range=[-2, 2],
    density_thresh=0.1)

optimizer = dict(
    _delete_=True,
    diffusion=dict(type='Adam', lr=1e-4, weight_decay=0.))
data = dict(
    train=dict(
        code_dir='cache/stage1_cars_recons16v/code',
        code_only=True))
lr_config = dict(
    _delete_=True,
    policy='Fixed',  # step lr makes two-stage FID unstable
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=0.001)

evaluation = [
    dict(
        type='GenerativeEvalHook3D',
        data='val_uncond',
        interval=20000,
        feed_batch_size=32,
        viz_step=32,
        metrics=dict(
            type='FIDKID',
            num_images=704 * 251,
            inception_pkl='work_dirs/cache/cars_test_inception_stylegan.pkl',
            inception_args=dict(
                type='StyleGAN',
                inception_path='work_dirs/cache/inception-2015-12-05.pt'),
            bgr2rgb=False),
        viz_dir=work_dir + '/viz_uncond',
        save_best_ckpt=False)]

custom_hooks = [
    dict(
        type='ExponentialMovingAverageHook',
        module_keys=('diffusion_ema',),
        interp_mode='lerp',
        interval=1,
        start_iter=0,
        momentum_policy='rampup',
        momentum_cfg=dict(ema_kimg=4, ema_rampup=0.05, batch_size=16,
                          eps=1e-8),
        priority='VERY_HIGH')
]
