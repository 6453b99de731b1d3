#!/usr/bin/env python
"""Convert a reference SSDNeRF torch checkpoint into this framework's
state format.

The reference checkpoints (mmcv format: a dict with 'state_dict' holding
decoder/decoder_ema/diffusion/diffusion_ema torch tensors) map onto our
Flax param trees:

- TriPlaneDecoder: ``decoder.base_net.0`` -> ``base_net/dense_0`` etc.
  (torch Linear weight (out, in) -> Flax kernel (in, out)).
- DenoisingUnetMod: the mmgen flat ``in_blocks``/``mid_blocks``/
  ``out_blocks`` ModuleList indices are re-enumerated by walking the same
  construction loops (denoising.py:108-189) and matched to our named
  modules (in_conv / in_res_i / in_attn_i / down_l / mid_* / out_res_i /
  out_attn_i / up_l / out_norm / out_conv).

Best-effort: unmatched source/target keys are reported; use --strict to
fail on any mismatch.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _unet_block_map(cfg):
    """Enumerate mmgen in/out block indices -> our module names."""
    channels_cfg = list(cfg.get('channels_cfg', [1, 2, 2, 4, 4]))
    rpd = cfg.get('resblocks_per_downsample', 2)
    image_size = cfg.get('image_size', 128)
    if isinstance(image_size, int):
        image_size = (image_size, image_size)
    attention_res = cfg.get('attention_res', [16, 8])
    attention_scale = [min(image_size) // int(r) for r in attention_res]

    in_map = {}   # mmgen in_blocks index -> list of (sub_idx, our_name, kind)
    idx = 0
    in_map[idx] = [('0', 'in_conv', 'conv')]
    idx += 1
    scale = 1
    block_i = 0
    for level in range(len(channels_cfg)):
        for _ in range(rpd):
            entries = [('0', f'in_res_{block_i}', 'res')]
            if scale in attention_scale:
                entries.append(('1', f'in_attn_{block_i}', 'attn'))
            in_map[idx] = entries
            idx += 1
            block_i += 1
        if level != len(channels_cfg) - 1:
            in_map[idx] = [('0', f'down_{level}', 'down')]
            idx += 1
            scale *= 2

    out_map = {}
    block_i = 0
    idx = 0
    for level in range(len(channels_cfg)):
        for sub in range(rpd + 1):
            entries = [('0', f'out_res_{block_i}', 'res')]
            e = 1
            if scale in attention_scale:
                entries.append((str(e), f'out_attn_{block_i}', 'attn'))
                e += 1
            if level != len(channels_cfg) - 1 and sub == rpd:
                entries.append((str(e), f'up_{level}', 'up'))
                scale //= 2
            out_map[idx] = entries
            idx += 1
            block_i += 1
    return in_map, out_map


def _set(tree, path, value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = value


def _conv_w(w):
    """torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d_w(w):
    """torch conv1d (out, in, k) -> flax Conv (k, in, out)."""
    return np.transpose(w, (2, 1, 0))


def _lin_w(w):
    return np.transpose(w, (1, 0))


def _map_resblock(src, prefix, out, our):
    base = ('params', our)
    _set(out, base + ('norm_1', 'scale'), src[prefix + 'conv_1.0.weight'])
    _set(out, base + ('norm_1', 'bias'), src[prefix + 'conv_1.0.bias'])
    _set(out, base + ('conv_1', 'kernel'), _conv_w(src[prefix + 'conv_1.2.weight']))
    _set(out, base + ('conv_1', 'bias'), src[prefix + 'conv_1.2.bias'])
    emb_w = prefix + 'norm_with_embedding.embedding_layer.1.weight'
    _set(out, base + ('embedding_dense', 'kernel'), _lin_w(src[emb_w]))
    _set(out, base + ('embedding_dense', 'bias'),
         src[prefix + 'norm_with_embedding.embedding_layer.1.bias'])
    _set(out, base + ('norm_2', 'scale'),
         src[prefix + 'norm_with_embedding.norm.weight'])
    _set(out, base + ('norm_2', 'bias'),
         src[prefix + 'norm_with_embedding.norm.bias'])
    # conv_2 index depends on dropout: Sequential(act, [dropout,] conv)
    c2 = prefix + 'conv_2.2.weight' if prefix + 'conv_2.2.weight' in src \
        else prefix + 'conv_2.1.weight'
    _set(out, base + ('conv_2', 'kernel'), _conv_w(src[c2]))
    _set(out, base + ('conv_2', 'bias'), src[c2[:-6] + 'bias'])
    if prefix + 'shortcut.weight' in src:
        _set(out, base + ('shortcut', 'kernel'),
             _conv_w(src[prefix + 'shortcut.weight']))
        _set(out, base + ('shortcut', 'bias'), src[prefix + 'shortcut.bias'])
    consumed = [k for k in src if k.startswith(prefix)]
    return consumed


def _qkv_permute(w, groups, num_heads):
    """mmgen qkv channel layout -> ours.

    mmgen's attention reshape (modules.py:40-43: ``reshape(b, groups, -1,
    sp).transpose(1, 2).reshape(b * num_heads, -1, groups * sp)`` then
    ``chunk(3)``) makes each per-group output block head-major (nh, 3, hd);
    our SelfAttention reads (3, nh, hd).  Permute the out-channel axis.
    """
    out_ch = w.shape[0]
    per_g = out_ch // groups
    hd = per_g // (3 * num_heads)
    w = w.reshape((groups, num_heads, 3, hd) + w.shape[1:])
    w = np.moveaxis(w, 2, 1)
    return w.reshape((out_ch,) + w.shape[4:])


def _map_attention(src, prefix, out, our, groups=1, num_heads=4):
    base = ('params', our)
    _set(out, base + ('norm', 'scale'), src[prefix + 'norm.weight'])
    _set(out, base + ('norm', 'bias'), src[prefix + 'norm.bias'])
    qkv_w = _qkv_permute(src[prefix + 'qkv.weight'], groups, num_heads)
    qkv_b = _qkv_permute(src[prefix + 'qkv.bias'], groups, num_heads)
    _set(out, base + ('qkv', 'kernel'), _conv1d_w(qkv_w))
    _set(out, base + ('qkv', 'bias'), qkv_b)
    _set(out, base + ('proj', 'kernel'), _conv1d_w(src[prefix + 'proj.weight']))
    _set(out, base + ('proj', 'bias'), src[prefix + 'proj.bias'])
    return [k for k in src if k.startswith(prefix)]


def convert_unet(src, unet_cfg):
    """src: dict of numpy arrays keyed by mmgen module paths (relative to
    the denoising module). Returns our flax params dict."""
    out = {}
    consumed = set()
    groups = unet_cfg.get('groups', 1)
    num_heads = unet_cfg.get('num_heads', 4)
    # time embedding: mmgen TimeEmbedding.blocks = Seq(Linear, act, Linear)
    _set(out, ('params', 'time_embedding', 'dense_0', 'kernel'),
         _lin_w(src['time_embedding.blocks.0.weight']))
    _set(out, ('params', 'time_embedding', 'dense_0', 'bias'),
         src['time_embedding.blocks.0.bias'])
    _set(out, ('params', 'time_embedding', 'dense_1', 'kernel'),
         _lin_w(src['time_embedding.blocks.2.weight']))
    _set(out, ('params', 'time_embedding', 'dense_1', 'bias'),
         src['time_embedding.blocks.2.bias'])
    consumed.update(k for k in src if k.startswith('time_embedding.'))

    in_map, out_map = _unet_block_map(unet_cfg)
    for idx, entries in in_map.items():
        for sub, our, kind in entries:
            prefix = f'in_blocks.{idx}.{sub}.'
            if kind == 'conv':
                _set(out, ('params', 'in_conv', 'kernel'),
                     _conv_w(src[f'in_blocks.{idx}.{sub}.weight']))
                _set(out, ('params', 'in_conv', 'bias'),
                     src[f'in_blocks.{idx}.{sub}.bias'])
                consumed.update([f'in_blocks.{idx}.{sub}.weight',
                                 f'in_blocks.{idx}.{sub}.bias'])
            elif kind == 'res':
                consumed.update(_map_resblock(src, prefix, out, our))
            elif kind == 'attn':
                consumed.update(_map_attention(src, prefix, out, our,
                                               groups, num_heads))
            elif kind == 'down':
                _set(out, ('params', our, 'conv', 'kernel'),
                     _conv_w(src[prefix + 'downsample.weight']))
                _set(out, ('params', our, 'conv', 'bias'),
                     src[prefix + 'downsample.bias'])
                consumed.update(k for k in src if k.startswith(prefix))
    # middle
    consumed.update(_map_resblock(src, 'mid_blocks.0.', out, 'mid_res_0'))
    consumed.update(_map_attention(src, 'mid_blocks.1.', out, 'mid_attn',
                                   groups, num_heads))
    consumed.update(_map_resblock(src, 'mid_blocks.2.', out, 'mid_res_1'))
    for idx, entries in out_map.items():
        for sub, our, kind in entries:
            prefix = f'out_blocks.{idx}.{sub}.'
            if kind == 'res':
                consumed.update(_map_resblock(src, prefix, out, our))
            elif kind == 'attn':
                consumed.update(_map_attention(src, prefix, out, our,
                                               groups, num_heads))
            elif kind == 'up':
                _set(out, ('params', our, 'conv', 'kernel'),
                     _conv_w(src[prefix + 'conv.weight']))
                _set(out, ('params', our, 'conv', 'bias'),
                     src[prefix + 'conv.bias'])
                consumed.update(k for k in src if k.startswith(prefix))
    # out: ConvModule order ('norm','act','conv') -> out.gn + out.conv
    for cand_n, cand_c in (('out.gn', 'out.conv'), ('out.norm', 'out.conv')):
        if cand_n + '.weight' in src:
            _set(out, ('params', 'out_norm', 'scale'), src[cand_n + '.weight'])
            _set(out, ('params', 'out_norm', 'bias'), src[cand_n + '.bias'])
            _set(out, ('params', 'out_conv', 'kernel'),
                 _conv_w(src[cand_c + '.weight']))
            _set(out, ('params', 'out_conv', 'bias'), src[cand_c + '.bias'])
            consumed.update(k for k in src if k.startswith('out.'))
            break
    leftover = sorted(set(src) - consumed)
    return out, leftover


def convert_decoder(src):
    """src keyed relative to the decoder module."""
    out = {}
    name_map = {'base_net': 'base_net', 'density_net': 'density_net',
                'color_net': 'color_net', 'dir_net': 'dir_net'}
    consumed = set()
    for t_name, f_name in name_map.items():
        j = 0
        # Sequential interleaves parameter-free activations; scan indices
        for i in range(24):
            if f'{t_name}.{i}.weight' not in src:
                continue
            _set(out, ('params', f_name, f'dense_{j}', 'kernel'),
                 _lin_w(src[f'{t_name}.{i}.weight']))
            _set(out, ('params', f_name, f'dense_{j}', 'bias'),
                 src[f'{t_name}.{i}.bias'])
            consumed.update([f'{t_name}.{i}.weight', f'{t_name}.{i}.bias'])
            j += 1
    leftover = sorted(set(src) - consumed)
    return out, leftover


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('src', help='reference .pth checkpoint')
    parser.add_argument('config', help='matching config in this repo')
    parser.add_argument('out', help='output .ckpt path')
    parser.add_argument('--strict', action='store_true')
    args = parser.parse_args()

    import torch
    import jax
    from ssdnerf_tpu.config import Config
    from ssdnerf_tpu.registry import build_model
    from ssdnerf_tpu.core.checkpoint import save_checkpoint

    ckpt = torch.load(args.src, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}

    cfg = Config.fromfile(args.config)
    model = build_model(cfg.model, train_cfg=dict(cfg.get('train_cfg', {})),
                        test_cfg=dict(cfg.get('test_cfg', {})))
    state = model.init_state(jax.random.PRNGKey(0), cfg.get('optimizer', {}))

    unet_cfg = dict(cfg.model.diffusion.denoising)
    problems = []
    for group in ('decoder', 'decoder_ema', 'diffusion', 'diffusion_ema'):
        sub = {k[len(group) + 1:]: v for k, v in sd.items()
               if k.startswith(group + '.')}
        if not sub:
            continue
        if group.startswith('decoder'):
            params, leftover = convert_decoder(sub)
        else:
            den = {k[len('denoising.'):]: v for k, v in sub.items()
                   if k.startswith('denoising.')}
            params, leftover = convert_unet(den, unet_cfg)
        if leftover:
            problems.append((group, leftover))
        # structural check against the initialized tree
        import jax.numpy as jnp
        ours = state[group]
        flat_new = {jax.tree_util.keystr(k): v for k, v in
                    jax.tree_util.tree_flatten_with_path(params)[0]}
        flat_ref = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_flatten_with_path(ours)[0]}
        missing = sorted(set(flat_ref) - set(flat_new))
        for k in list(flat_new):
            if k in flat_ref and tuple(flat_new[k].shape) != tuple(flat_ref[k]):
                problems.append((group, [f'shape mismatch {k}: '
                                         f'{flat_new[k].shape} vs {flat_ref[k]}']))
        if missing:
            problems.append((group, [f'missing {m}' for m in missing]))
        from flax import serialization
        state[group] = serialization.from_state_dict(ours, params)
        print(f'{group}: converted {len(flat_new)} tensors')

    for group, issues in problems:
        print(f'[warn] {group}: {len(issues)} issues, e.g. {issues[:5]}')
    if problems and args.strict:
        sys.exit(1)
    save_checkpoint(args.out, state, iteration=ckpt.get('meta', {}).get(
        'iter', 0))
    print(f'Wrote {args.out}')


if __name__ == '__main__':
    main()
