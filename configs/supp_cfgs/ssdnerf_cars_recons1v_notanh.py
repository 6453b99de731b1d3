# No-tanh ablation of single-view cars reconstruction: raw (identity) code
# activation with adjusted triplane learning rates.
# Reference: /root/reference/configs/supp_cfgs/ssdnerf_cars_recons1v_notanh.py
_base_ = ['../paper_cfgs/ssdnerf_cars_recons1v.py']

name = 'ssdnerf_cars_recons1v_notanh'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

model = dict(code_activation=dict(_delete_=True, type='IdentityCode'))

train_cfg = dict(
    optimizer=dict(lr=2e-2),
    cache_load_from=code_dir)
test_cfg = dict(optimizer=dict(lr=0.01))

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
        step=[2000],
        cfgs=[{'train_cfg.extra_scene_step': 3}],
        by_epoch=False)
]
