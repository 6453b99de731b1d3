# Single-view reconstruction on SRN Chairs: recons1v recipe with a softer
# SNR power and Langevin-corrected guided sampling.
_base_ = ['ssdnerf_cars_recons1v.py']

name = 'ssdnerf_chairs_recons1v'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name
eval_interval = 20000

model = dict(
    diffusion=dict(timestep_sampler=dict(power=0.25)),
    cache_size=4612)

train_cfg = dict(cache_load_from=code_dir)
test_cfg = dict(
    guidance_gain=0.4 * (2 ** 14),
    snr_weight_power=0.25,
    langevin_steps=5,
    langevin_delta=0.4)

dataset_type = 'ShapeNetSRN'
data = dict(
    train=dict(
        data_prefix='data/shapenet/chairs_train/chairs_2.0_train',
        cache_path='data/shapenet/chairs_train_cache.pkl'),
    val_uncond=dict(
        data_prefix='data/shapenet/chairs_test',
        cache_path='data/shapenet/chairs_test_cache.pkl'),
    val_cond=dict(
        data_prefix='data/shapenet/chairs_test',
        cache_path='data/shapenet/chairs_test_cache.pkl'))

evaluation = [
    dict(
        type='GenerativeEvalHook3D',
        data='val_cond',
        interval=eval_interval,
        feed_batch_size=32,
        viz_step=32,
        metrics=dict(
            type='FID',
            num_images=1317 * 250,
            inception_pkl='work_dirs/cache/chairs_test_inception_stylegan.pkl',
            inception_args=dict(
                type='StyleGAN',
                inception_path='work_dirs/cache/inception-2015-12-05.pt'),
            bgr2rgb=False),
        viz_dir=work_dir + '/viz_cond',
        save_best_ckpt=False)]
