#!/usr/bin/env python
"""Evaluation CLI.

Mirrors /root/reference/test.py + tools/test.py:115-253: per ``evaluation``
entry, build the val dataset + metrics, run evaluate_3d, print summaries.
"""
import argparse
import os
import sys


def parse_args():
    parser = argparse.ArgumentParser(description='Test SSDNeRF (TPU)')
    parser.add_argument('config')
    parser.add_argument('checkpoint')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--viz-dir', default=None)
    parser.add_argument('--gpu-ids', nargs='+', type=int, default=None,
                        help='accepted for CLI parity; ignored on TPU')
    parser.add_argument('--max-num-scenes', type=int, default=None)
    parser.add_argument('--cfg-options', nargs='+', default=[])
    return parser.parse_args()


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    args = parse_args()
    from ssdnerf_tpu.config import Config, parse_cfg_option
    from ssdnerf_tpu.apis import evaluate_3d
    from ssdnerf_tpu.apis.inference import init_model
    from ssdnerf_tpu.data.builder import build_dataset
    from ssdnerf_tpu.core.evaluation import build_metric

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(parse_cfg_option(kv)
                                 for kv in args.cfg_options))
    model, state = init_model(cfg, args.checkpoint)

    for ev in cfg.get('evaluation', []):
        ev = dict(ev)
        ev.pop('type', None)
        data_key = ev.pop('data')
        dataset = build_dataset(cfg.data[data_key])
        metric_cfg = ev.pop('metrics', None)
        metrics = []
        if metric_cfg:
            m = build_metric(metric_cfg)
            m.prepare()
            metrics = [m]
        viz_dir = args.viz_dir or ev.get('viz_dir')
        log_vars = evaluate_3d(
            model, state, dataset,
            batch_size=ev.get('feed_batch_size', 32), metrics=metrics,
            viz_dir=viz_dir, max_num_scenes=args.max_num_scenes,
            seed=args.seed)
        print('==== evaluation results ====')
        for k, v in log_vars.items():
            print(f'  {k}: {v:.4f}')
        for m in metrics:
            try:
                m.summary()
                print(f'  {m.name}: {m.result_str}')
            except RuntimeError as e:
                print(f'  {m.name}: unavailable ({e})')


if __name__ == '__main__':
    main()
