#!/usr/bin/env python
"""Precompute real-image Inception statistics for FID/KID.

Equivalent of /root/reference/tools/inception_stat.py:26-128: renders/loads
the real eval images for a dataset config, extracts Inception features and
writes the ``{mean, cov, feats_np}`` pickle consumed by the FID/FIDKID
metrics.  Uses the torch-scripted StyleGAN Inception network at
``--inception-path`` (the same inception-2015-12-05.pt file the reference
uses) when present; otherwise the JAX-native InceptionV3
(core/evaluation/feature_nets.py — converted weights via
tools/convert_vision_nets.py, or seeded substitute weights, which are
self-consistent between real and fake passes but not comparable to
published FID numbers).
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--data', default='val_uncond',
                        help='dataset key in cfg.data')
    parser.add_argument('--out', required=True, help='output pkl path')
    parser.add_argument('--inception-path',
                        default='work_dirs/cache/inception-2015-12-05.pt')
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--max-images', type=int, default=-1)
    args = parser.parse_args()

    from ssdnerf_tpu.config import Config
    from ssdnerf_tpu.data.builder import build_dataset

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg.data[args.data])
    ds_cfg['load_imgs'] = True
    dataset = build_dataset(ds_cfg)
    if os.path.exists(args.inception_path):
        from ssdnerf_tpu.core.evaluation.fid import _torchscript_inception
        extractor = _torchscript_inception(args.inception_path)
    else:
        from ssdnerf_tpu.core.evaluation.feature_nets import \
            make_inception_extractor
        print(f'{args.inception_path} absent -> JAX-native InceptionV3',
              flush=True)
        extractor = make_inception_extractor()

    feats = []
    count = 0
    for i in range(len(dataset)):
        item = dataset[i]
        imgs = item.get('test_imgs', item.get('cond_imgs'))
        if imgs is None:
            continue
        imgs_u8 = np.clip(np.round(imgs * 255), 0, 255).astype(np.uint8)
        for j in range(0, len(imgs_u8), args.batch_size):
            feats.append(extractor(imgs_u8[j:j + args.batch_size]))
        count += len(imgs_u8)
        if args.max_images > 0 and count >= args.max_images:
            break
        if i % 50 == 0:
            print(f'{i}/{len(dataset)} scenes, {count} images', flush=True)

    feats_np = np.concatenate(feats, axis=0)
    if args.max_images > 0:
        feats_np = feats_np[:args.max_images]
    out = dict(mean=np.mean(feats_np, 0),
               cov=np.cov(feats_np, rowvar=False),
               feats_np=feats_np)
    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    with open(args.out, 'wb') as f:
        pickle.dump(out, f)
    print(f'Wrote {feats_np.shape[0]} features to {args.out}')


if __name__ == '__main__':
    main()
