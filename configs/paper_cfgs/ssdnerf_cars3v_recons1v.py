# Single-view reconstruction test of the 3-view-trained model.
_base_ = ['ssdnerf_cars_recons1v.py']

name = 'ssdnerf_cars3v_recons1v'
code_dir = 'cache/' + name + '/code'
work_dir = 'work_dirs/' + name

train_cfg = dict(cache_load_from=code_dir)
test_cfg = dict(guidance_gain=0.8 * (2 ** 14))
data = dict(train=dict(num_train_imgs=3, load_test_data=False))
