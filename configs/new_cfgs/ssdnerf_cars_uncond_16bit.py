# 16-bit scene cache variant (fp16 codes + bf16 Adam moments) with
# normalized tanh code activation and unnormalized DDPM loss.
_base_ = ['../paper_cfgs/ssdnerf_cars_uncond.py']

name = 'ssdnerf_cars_uncond_16bit'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

model = dict(
    code_activation=dict(
        _delete_=True,
        type='NormalizedTanhCode', mean=0.0, std=0.5, clip_range=2),
    diffusion=dict(
        ddpm_loss=dict(weight_scale=20, scale_norm=False)),
    cache_16bit=True)

train_cfg = dict(cache_load_from=code_dir)

custom_hooks = [
    dict(
        type='ExponentialMovingAverageHook',
        module_keys=('diffusion_ema', 'decoder_ema'),
        interp_mode='lerp',
        interval=1,
        start_iter=0,
        momentum_policy='rampup',
        momentum_cfg=dict(ema_kimg=4, ema_rampup=0.05, batch_size=16,
                          eps=1e-8),
        priority='VERY_HIGH'),
    dict(
        type='SaveCacheHook',
        interval=5000,
        by_epoch=False,
        out_dir=code_dir,
        viz_dir='cache/' + name + '/viz'),
    dict(
        type='ModelUpdaterHook',
        step=[2000, 100000, 500000],
        cfgs=[{'train_cfg.extra_scene_step': 3},
              {'train_cfg.extra_scene_step': 1},
              {'train_cfg.extra_scene_step': 1,
               'train_cfg.optimizer.lr': 2.5e-3,
               'pixel_loss.loss_weight': 10.0,
               'reg_loss.loss_weight': 1.5e-3}],
        by_epoch=False)
]
