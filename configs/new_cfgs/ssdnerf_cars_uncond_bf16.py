# Flagship unconditional cars with the UNet computing in bfloat16
# (params, GroupNorm statistics and attention softmax stay float32).
# TPU-native addition: ~2x UNet MXU throughput at matched quality; the
# reference has no training-time half-precision path (fp16 is
# inference-only there, lib/models/autodecoders/diffusion_nerf.py:114-120).
_base_ = ['../paper_cfgs/ssdnerf_cars_uncond.py']

name = 'ssdnerf_cars_uncond_bf16'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

model = dict(diffusion=dict(denoising=dict(dtype='bfloat16')))

train_cfg = dict(cache_load_from=code_dir)
