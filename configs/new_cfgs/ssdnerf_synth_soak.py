# 5k-iteration soak at flagship model shapes on synthetic SRN data
# (VERDICT r4 #8): the real train.py runner with EMA + SaveCache + eval +
# checkpoint hooks live and a ModelUpdaterHook crossing TWO recompile
# boundaries (ess 3->2 at 1k, then pack/march-slot decoder swap + ess 1 at
# 2.5k — the flagship schedule's 2k/100k transitions scaled to soak
# length, configs/paper_cfgs/ssdnerf_cars_uncond.py:106-123).  Drift and
# peak-memory analysis over the run goes in PERF.md.
_base_ = ['ssdnerf_synth_smoke.py']

name = 'ssdnerf_synth_soak'
work_dir = 'work_dirs/' + name
save_interval = 2500
eval_interval = 2500
total_iters = 5000

checkpoint_config = dict(interval=save_interval, max_keep_ckpts=2)

evaluation = [
    dict(
        type='GenerativeEvalHook3D',
        data='val_uncond',
        interval=eval_interval,
        feed_batch_size=4,
        viz_step=4,
        metrics=dict(
            type='FIDKID',
            num_images=48,
            inception_pkl='/tmp/srn_synth/inception.pkl',
            bgr2rgb=False),
        viz_dir='viz/' + name,
        save_best_ckpt=False)
]

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
        out_dir='cache/' + name + '/code',
        viz_dir='cache/' + name + '/viz'),
    dict(
        type='ModelUpdaterHook',
        step=[1000, 2500],
        cfgs=[{'train_cfg.extra_scene_step': 2},
              {'train_cfg.extra_scene_step': 1,
               'diffusion.ddpm_loss.freeze_norm': True,
               'decoder.pack_slots': 512,
               'decoder.march_slots': 128}],
        by_epoch=False)
]
