# Default runtime settings shared by all configs.
save_interval = 5000
eval_interval = 20000

checkpoint_config = dict(interval=save_interval, by_epoch=False,
                         max_keep_ckpts=2)
log_config = dict(
    interval=50,
    hooks=[
        dict(type='TextLoggerHook'),
        dict(type='TensorboardLoggerHook'),
    ])
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', save_interval)]
