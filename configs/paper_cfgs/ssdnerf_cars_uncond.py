_base_ = ['../_base_/models/ssdnerf_18ch.py', '../_base_/default_runtime.py']

name = 'ssdnerf_cars_uncond'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name
save_interval = 5000
eval_interval = 20000

model = dict(cache_size=2458)  # number of SRN Cars training scenes

train_cfg = dict(
    dt_gamma_scale=0.5,
    density_thresh=0.1,
    extra_scene_step=15,       # K_in - 1 inner code-optimization steps
    n_inverse_rays=2 ** 12,
    n_decoder_rays=2 ** 12,
    loss_coef=0.1 / (128 * 128),
    optimizer=dict(type='Adam', lr=5e-3, weight_decay=0.),
    cache_load_from=code_dir,
    viz_dir=None)
test_cfg = dict(
    img_size=(128, 128),
    num_timesteps=50,          # DDIM steps
    clip_range=[-2, 2],
    density_thresh=0.1,
    # TPU renderer work reduction for eval renders of pruned scenes:
    # occupied-AABB march clipping (exact once the pruned AABB spans
    # <= 128 steps) + cross-ray packed decoding (PERF.md)
    march_slots=128,
    pack_slots=512)

optimizer = dict(
    diffusion=dict(type='Adam', lr=1e-4, weight_decay=0.),
    decoder=dict(type='Adam', lr=1e-3, weight_decay=0.))
dataset_type = 'ShapeNetSRN'
data = dict(
    samples_per_gpu=8,
    workers_per_gpu=4,
    train=dict(
        type=dataset_type,
        data_prefix='data/shapenet/cars_train',
        # decoded-PNG RAM cache (~2.4 GB for cars_train as uint8): the
        # loader sustains ~15 batches/s with it vs ~4 without
        # (tools/loader_bench.py) — required to not starve the TPU at the
        # ~114 ms/step flagship rate
        cache_decoded=True,
        cache_path='data/shapenet/cars_train_cache.pkl'),
    val_uncond=dict(
        type=dataset_type,
        data_prefix='data/shapenet/cars_test',
        load_imgs=False,
        num_test_imgs=251,
        scene_id_as_name=True,
        cache_path='data/shapenet/cars_test_cache.pkl'),
    val_cond=dict(
        type=dataset_type,
        data_prefix='data/shapenet/cars_test',
        specific_observation_idcs=[64],
        cache_path='data/shapenet/cars_test_cache.pkl'),
    train_dataloader=dict(split_data=True))
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=0.001,
    gamma=0.5,
    step=[500000])

evaluation = [
    dict(
        type='GenerativeEvalHook3D',
        data='val_uncond',
        interval=eval_interval,
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

total_iters = 1000000

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
        interval=save_interval,
        by_epoch=False,
        out_dir=code_dir,
        viz_dir='cache/' + name + '/viz'),
    dict(
        type='ModelUpdaterHook',
        step=[2000, 100000, 500000],
        cfgs=[{'train_cfg.extra_scene_step': 3},
              {'train_cfg.extra_scene_step': 1,
               'diffusion.ddpm_loss.freeze_norm': True,
               # density grids are long pruned by 100k: packed decoding +
               # AABB-clipped marching are exact there and ~1.5x the
               # training render (PERF.md); scheduled, not initial, so the
               # unpruned warm-up never truncates
               'decoder.pack_slots': 512,
               'decoder.march_slots': 128},
              {'train_cfg.extra_scene_step': 1,
               'train_cfg.optimizer.lr': 2.5e-3,
               'diffusion.ddpm_loss.freeze_norm': True,
               'pixel_loss.loss_weight': 10.0,
               'reg_loss.loss_weight': 1.5e-3}],
        by_epoch=False)
]
