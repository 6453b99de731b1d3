_base_ = ['../_base_/models/ssdnerf_18ch.py', '../_base_/default_runtime.py']

# Zero-egress end-to-end smoke config: the FULL flagship model (18-channel
# 128^2 triplane codes, ADM UNet prior) trained on the synthetic SRN-layout
# sphere dataset written by tools/make_synthetic_srn.py, so the real CLI
# pipeline — train.py (runner, hooks, eval, checkpoints) then test.py — runs
# end to end in an image with no real SRN data.  Mirrors
# paper_cfgs/ssdnerf_cars_uncond.py with dataset-scale numbers swapped for
# the 16-scene/64x64 synthetic split (reference workflow:
# /root/reference/README.md "Training" + tools/inception_stat.py).

name = 'ssdnerf_synth_smoke'
work_dir = 'work_dirs/' + name
save_interval = 400
eval_interval = 400
total_iters = 400

model = dict(cache_size=16)

train_cfg = dict(
    dt_gamma_scale=0.5,
    density_thresh=0.1,
    extra_scene_step=3,
    n_inverse_rays=2 ** 12,    # 64x64 = one full image per inner step
    n_decoder_rays=2 ** 12,
    loss_coef=0.1 / (64 * 64),
    optimizer=dict(type='Adam', lr=5e-3, weight_decay=0.),
    viz_dir=None)
test_cfg = dict(
    img_size=(64, 64),
    num_timesteps=20,
    clip_range=[-2, 2],
    density_thresh=0.1,
    pack_slots=512)

optimizer = dict(
    diffusion=dict(type='Adam', lr=1e-4, weight_decay=0.),
    decoder=dict(type='Adam', lr=1e-3, weight_decay=0.))
dataset_type = 'ShapeNetSRN'
data = dict(
    samples_per_gpu=8,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        data_prefix='/tmp/srn_synth/train'),
    val_uncond=dict(
        type=dataset_type,
        data_prefix='/tmp/srn_synth/test',
        load_imgs=False,
        num_test_imgs=12,
        scene_id_as_name=True),
    val_cond=dict(
        type=dataset_type,
        data_prefix='/tmp/srn_synth/test',
        specific_observation_idcs=[0]),
    train_dataloader=dict(split_data=True))
lr_config = dict(policy='Fixed')
checkpoint_config = dict(interval=save_interval, by_epoch=False,
                         max_keep_ckpts=1)
log_config = dict(interval=50,
                  hooks=[dict(type='TextLoggerHook')])

evaluation = [
    dict(
        type='GenerativeEvalHook3D',
        data='val_uncond',
        interval=eval_interval,
        feed_batch_size=4,
        viz_step=4,
        metrics=dict(
            type='FIDKID',
            num_images=4 * 12,
            inception_pkl='/tmp/srn_synth/inception.pkl',
            inception_args=dict(
                type='StyleGAN',
                inception_path='work_dirs/cache/inception-2015-12-05.pt'),
            bgr2rgb=False),
        viz_dir=work_dir + '/viz_uncond',
        save_best_ckpt=False)]
