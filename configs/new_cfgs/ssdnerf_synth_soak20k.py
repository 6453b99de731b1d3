# Extended 20k-iteration soak (4x VERDICT r4 #8's ask): the same
# flagship-schedule transitions as ssdnerf_synth_soak, then a long
# ess=1+packed steady state — it/s drift, checkpoint/eval cycles and
# density-spike recovery over a production-length horizon.
_base_ = ['ssdnerf_synth_soak.py']

name = 'ssdnerf_synth_soak20k'
work_dir = 'work_dirs/' + name
save_interval = 5000
eval_interval = 10000
total_iters = 20000

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
