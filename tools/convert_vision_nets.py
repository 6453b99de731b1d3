#!/usr/bin/env python
"""Convert torch weights for the JAX feature networks to .npz.

Sources (any one):
- torchvision InceptionV3 / pytorch-fid FID weights state_dict (.pth)
- the ``lpips`` package's VGG16 + linear-head weights

Usage:
  python tools/convert_vision_nets.py inception src.pth out.npz
  python tools/convert_vision_nets.py lpips src.pth out.npz
      (for lpips, src.pth may also be omitted when the lpips package is
      importable with downloaded weights)

The .npz keeps the torch key names; ssdnerf_tpu.core.evaluation.
feature_nets.load_torch_state maps them onto the Flax modules.
"""
import argparse

import numpy as np


def inception_state_to_arrays(sd):
    """torch state_dict -> the npz array dict load_torch_state consumes."""
    out = {}
    for k, v in sd.items():
        if k.startswith(('fc.', 'AuxLogits')) or 'num_batches_tracked' in k:
            continue
        out[k] = v.detach().numpy() if hasattr(v, 'detach') else np.asarray(v)
    return out


def convert_inception(src, out):
    import torch
    sd = torch.load(src, map_location='cpu', weights_only=False)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    sd = sd.get('state_dict', sd)
    arrays = inception_state_to_arrays(
        {k: v for k, v in sd.items() if hasattr(v, 'numpy')})
    np.savez(out, **arrays)
    print(f'wrote {len(arrays)} tensors to {out}')


def lpips_state_to_arrays(sd):
    """lpips-package state_dict -> npz array dict for load_torch_state."""
    arrays = {}
    for k, v in sd.items():
        v = v.detach().numpy() if hasattr(v, 'detach') else np.asarray(v)
        # lpips names: net.sliceN.<idx>.weight -> conv<idx>; lins.K.model.1
        if '.model.' in k and k.startswith(('lin', 'lins')):
            num = ''.join(c for c in k.split('.model.')[0] if c.isdigit())
            arrays[f'lin{num}'] = v.reshape(1, 1, 1, -1)
        elif 'slice' in k:
            idx = k.split('.')[-2]
            arrays[f'conv{idx}.{k.split(".")[-1]}'] = v
        elif k.startswith('features.'):
            idx = k.split('.')[1]
            arrays[f'conv{idx}.{k.split(".")[-1]}'] = v
    return arrays


def convert_lpips(src, out):
    import torch
    if src:
        sd = torch.load(src, map_location='cpu', weights_only=False)
        if hasattr(sd, 'state_dict'):
            sd = sd.state_dict()
    else:
        import lpips
        sd = lpips.LPIPS(net='vgg', eval_mode=True).state_dict()
    arrays = lpips_state_to_arrays(sd)
    np.savez(out, **arrays)
    print(f'wrote {len(arrays)} tensors to {out}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('net', choices=['inception', 'lpips'])
    p.add_argument('src', nargs='?', default=None)
    p.add_argument('out')
    args = p.parse_args()
    if args.net == 'inception':
        convert_inception(args.src, args.out)
    else:
        convert_lpips(args.src, args.out)


if __name__ == '__main__':
    main()
