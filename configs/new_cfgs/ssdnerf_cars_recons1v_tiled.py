# Tiled-triplane rollout: the 3 planes unroll side-by-side into a
# (6, 128, 384) diffusion image (code_permute + code_reshape), with a
# narrower 6-level UNet and bf16 autocast sampling.
_base_ = ['ssdnerf_cars_recons1v_16bit.py']

name = 'ssdnerf_cars_recons1v_tiled'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

model = dict(
    code_permute=(1, 2, 0, 3),
    code_reshape=(6, 128, 384),
    cache_16bit=False,
    autocast_dtype='bfloat16',
    diffusion=dict(
        denoising=dict(
            image_size=[128, 384],
            in_channels=6,
            base_channels=80,
            channels_cfg=[1, 1, 2, 2, 4, 4],
            attention_res=[16, 8, 4],
            norm_groups=16)))

train_cfg = dict(cache_load_from=code_dir)
