# Stage-1 with the filesystem cache (for datasets too large for RAM):
# per-iteration scene files written by background writers, with periodic
# backup copies.  To resume after an interruption, manually replace the
# files in `code_dir` with the backups in `code_bak_dir`.
_base_ = ['stage1_cars_recons16v_16bit.py']

name = 'stage1_cars_recons16v_16bit_filesystem'
code_dir = 'cache/' + name + '/code'
code_bak_dir = 'cache/' + name + '/code_bak'
work_dir = 'work_dirs/' + name

model = dict(
    cache_size=0,          # disable the RAM cache
    num_file_writers=4)

train_cfg = dict(
    _delete_=True,
    dt_gamma_scale=0.5,
    density_thresh=0.1,
    extra_scene_step=15,
    n_inverse_rays=2 ** 12,
    n_decoder_rays=2 ** 12,
    loss_coef=0.1 / (128 * 128),
    optimizer=dict(type='Adam', lr=1e-2, weight_decay=0.),
    save_dir=code_dir,
    viz_dir=None)

data = dict(train=dict(code_dir=code_dir))

custom_hooks = [
    dict(
        type='ExponentialMovingAverageHook',
        module_keys=('decoder_ema',),
        interp_mode='lerp',
        interval=1,
        start_iter=0,
        momentum_policy='rampup',
        momentum_cfg=dict(ema_kimg=4, ema_rampup=0.05, batch_size=16,
                          eps=1e-8),
        priority='VERY_HIGH'),
    dict(
        type='DirCopyHook',
        interval=5000,
        by_epoch=False,
        in_dir=code_dir,
        out_dir=code_bak_dir),
    dict(
        type='ModelUpdaterHook',
        step=[2000],
        cfgs=[{'train_cfg.extra_scene_step': 3}],
        by_epoch=False)
]
