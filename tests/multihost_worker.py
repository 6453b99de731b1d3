"""Worker process for the two-process multi-host smoke test
(tests/test_multihost.py).  Not a test module; launched via subprocess.

Usage: python tests/multihost_worker.py <pid> <port> <data_dir> <work_dir>
           <out_json>
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault('JAX_PLATFORMS', 'cpu')


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    data_dir = sys.argv[3]
    work_dir = sys.argv[4]
    out_json = sys.argv[5]

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(f'localhost:{port}', num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    from ssdnerf_tpu.config import Config
    from ssdnerf_tpu.apis.train import train_model
    from ssdnerf_tpu.apis.test import allgather_weighted_sums
    from tests.synthetic import (TINY_MODEL_CFG, TINY_TRAIN_CFG,
                                 TINY_TEST_CFG)

    model_cfg = dict(TINY_MODEL_CFG, cache_size=6)
    cfg = Config._wrap(dict(
        model=model_cfg,
        train_cfg=dict(TINY_TRAIN_CFG, extra_scene_step=0),
        test_cfg=dict(TINY_TEST_CFG),
        optimizer=dict(
            diffusion=dict(type='Adam', lr=1e-4, weight_decay=0.),
            decoder=dict(type='Adam', lr=1e-3, weight_decay=0.)),
        lr_config=dict(policy='Fixed'),
        data=dict(
            samples_per_gpu=2,
            train=dict(type='ShapeNetSRN', data_prefix=data_dir),
            train_dataloader=dict(split_data=True)),
        checkpoint_config=dict(interval=1000),
        log_config=dict(interval=1),
        total_iters=2))

    runner = train_model(cfg, work_dir=work_dir, rank=pid, world_size=2,
                         max_iters=2)

    # the multi-host eval aggregation (lib/apis/test.py:58-69 semantics):
    # rank r contributes sum (r+1)*(r+1) with weight (r+1); the dataset-
    # wide weighted mean is (1*1 + 2*2) / (1 + 2) = 5/3 on EVERY rank
    sums, weights = allgather_weighted_sums(
        {'metric': float((pid + 1) ** 2)}, {'metric': float(pid + 1)})
    agg_mean = sums['metric'] / weights['metric']

    out = dict(
        pid=pid,
        process_count=jax.process_count(),
        owned_scene_ids=sorted(int(i) for i in runner.data_loader.indices),
        cache_shard=[int(runner.cache.offset),
                     int(runner.cache.offset + runner.cache.local_size)],
        loss_keys=sorted(runner.last_log_vars.keys())[:5],
        agg_mean=agg_mean)
    with open(out_json, 'w') as f:
        json.dump(out, f)
    print('WORKER-OK', pid, flush=True)


if __name__ == '__main__':
    main()
