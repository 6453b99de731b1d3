# Stage-1 with 16-bit cache and normalized-tanh codes.
_base_ = ['../paper_cfgs/stage1_cars_recons16v.py']

name = 'stage1_cars_recons16v_16bit'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

model = dict(
    code_activation=dict(
        _delete_=True,
        type='NormalizedTanhCode', mean=0.0, std=0.5, clip_range=2),
    cache_16bit=True)

train_cfg = dict(cache_load_from=code_dir)
