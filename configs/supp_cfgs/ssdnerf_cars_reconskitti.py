# Reconstruction of real KITTI car crops (preprocessed by
# tools/kitti_preproc.py into SRN format) with a cars-trained model:
# single input view, Langevin-corrected guided sampling, spiral-render
# poses, no quantitative metrics (no GT novel views exist).
# Reference: /root/reference/configs/supp_cfgs/ssdnerf_cars_reconskitti.py
_base_ = ['../paper_cfgs/ssdnerf_cars_recons1v.py']

name = 'ssdnerf_cars_reconskitti'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

train_cfg = dict(cache_load_from=code_dir)
test_cfg = dict(
    _delete_=True,
    img_size=(128, 128),
    num_timesteps=75,           # DDIM steps
    clip_range=[-2, 2],
    density_thresh=0.1,
    dt_gamma_scale=0.5,
    n_inverse_rays=2 ** 14,
    loss_coef=0.1 / (128 * 128),
    guidance_gain=0.4 * (2 ** 14),
    cond_mode='guide_optim',
    n_inverse_steps=25,
    extra_scene_step=3,
    optimizer=dict(type='Adam', lr=0.005, weight_decay=0.),
    lr_scheduler=dict(type='ExponentialLR', gamma=0.998),
    langevin_steps=5,
    langevin_delta=0.4)

dataset_type = 'ShapeNetSRN'
data = dict(
    val_cond=dict(
        _delete_=True,
        type=dataset_type,
        data_prefix='data/shapenet/cars_kitti',
        specific_observation_idcs=[0],
        cache_path='data/shapenet/cars_kitti_cache.pkl',
        test_pose_override='demo/camera_spiral_cars'))

evaluation = [
    dict(
        type='GenerativeEvalHook3D',
        data='val_cond',
        interval=20000,
        feed_batch_size=32,
        viz_step=1,
        metrics=[],
        viz_dir=work_dir + '/viz_cond',
        save_best_ckpt=False)]
