"""Structural round-trip test for the reference-checkpoint converter: build
a torch-style state dict with the mmgen naming scheme from our initialized
params, convert, and check every tensor lands in the right slot."""
import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

from convert_checkpoint import (_unet_block_map, convert_unet,
                                convert_decoder, _conv_w, _conv1d_w, _lin_w)
from ssdnerf_tpu.models.architecture.unet import DenoisingUnet
from ssdnerf_tpu.models.autodecoders.multiscene import build_decoder
import jax.numpy as jnp


UNET_CFG = dict(image_size=16, in_channels=6, base_channels=32,
                channels_cfg=[1, 2], resblocks_per_downsample=1,
                num_heads=2, attention_res=[8])


def _torch_style_from_flax(params, unet_cfg):
    """Emit an mmgen-named state dict from our flax params (the inverse of
    convert_unet)."""
    p = params['params']
    src = {}

    def lin(dst, sub):
        src[dst + '.weight'] = np.asarray(sub['kernel']).T
        src[dst + '.bias'] = np.asarray(sub['bias'])

    def conv(dst, sub):
        src[dst + '.weight'] = np.transpose(np.asarray(sub['kernel']),
                                            (3, 2, 0, 1))
        src[dst + '.bias'] = np.asarray(sub['bias'])

    def conv1d(dst, sub):
        src[dst + '.weight'] = np.transpose(np.asarray(sub['kernel']),
                                            (2, 1, 0))
        src[dst + '.bias'] = np.asarray(sub['bias'])

    def norm(dst, sub):
        src[dst + '.weight'] = np.asarray(sub['scale'])
        src[dst + '.bias'] = np.asarray(sub['bias'])

    def res(prefix, name):
        sub = p[name]
        norm(prefix + 'conv_1.0', sub['norm_1'])
        conv(prefix + 'conv_1.2', sub['conv_1'])
        lin(prefix + 'norm_with_embedding.embedding_layer.1',
            sub['embedding_dense'])
        norm(prefix + 'norm_with_embedding.norm', sub['norm_2'])
        conv(prefix + 'conv_2.1', sub['conv_2'])
        if 'shortcut' in sub:
            conv(prefix + 'shortcut', sub['shortcut'])

    def qkv_to_mmgen(a):
        """Inverse of convert_checkpoint._qkv_permute: our out-channel
        layout (groups, 3, nh, hd) -> mmgen's (groups, nh, 3, hd)."""
        groups = unet_cfg.get('groups', 1)
        num_heads = unet_cfg.get('num_heads', 4)
        out_ch = a.shape[0]
        hd = out_ch // groups // (3 * num_heads)
        a = a.reshape((groups, 3, num_heads, hd) + a.shape[1:])
        a = np.moveaxis(a, 1, 2)
        return a.reshape((out_ch,) + a.shape[4:])

    def attn(prefix, name):
        sub = p[name]
        norm(prefix + 'norm', sub['norm'])
        w = np.transpose(np.asarray(sub['qkv']['kernel']), (2, 1, 0))
        src[prefix + 'qkv.weight'] = qkv_to_mmgen(w)
        src[prefix + 'qkv.bias'] = qkv_to_mmgen(np.asarray(sub['qkv']['bias']))
        conv1d(prefix + 'proj', sub['proj'])

    lin('time_embedding.blocks.0', p['time_embedding']['dense_0'])
    lin('time_embedding.blocks.2', p['time_embedding']['dense_1'])
    in_map, out_map = _unet_block_map(unet_cfg)
    for idx, entries in in_map.items():
        for sub_i, our, kind in entries:
            prefix = f'in_blocks.{idx}.{sub_i}.'
            if kind == 'conv':
                conv(f'in_blocks.{idx}.{sub_i}', p['in_conv'])
            elif kind == 'res':
                res(prefix, our)
            elif kind == 'attn':
                attn(prefix, our)
            elif kind == 'down':
                conv(prefix + 'downsample', p[our]['conv'])
    res('mid_blocks.0.', 'mid_res_0')
    attn('mid_blocks.1.', 'mid_attn')
    res('mid_blocks.2.', 'mid_res_1')
    for idx, entries in out_map.items():
        for sub_i, our, kind in entries:
            prefix = f'out_blocks.{idx}.{sub_i}.'
            if kind == 'res':
                res(prefix, our)
            elif kind == 'attn':
                attn(prefix, our)
            elif kind == 'up':
                conv(prefix + 'conv', p[our]['conv'])
    norm('out.gn', p['out_norm'])
    conv('out.conv', p['out_conv'])
    return src


def test_unet_convert_roundtrip():
    unet = DenoisingUnet(
        image_size=(16, 16), in_channels=6, base_channels=32,
        channels_cfg=(1, 2), resblocks_per_downsample=1, num_heads=2,
        attention_res=(8,))
    x = jnp.zeros((1, 16, 16, 6))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    src = _torch_style_from_flax(jax.tree_util.tree_map(np.asarray, params),
                                 UNET_CFG)
    converted, leftover = convert_unet(src, UNET_CFG)
    assert leftover == [], leftover
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v), flat_b[ks], err_msg=ks)


def test_decoder_convert_roundtrip():
    dec = build_decoder(dict(
        type='TriPlaneDecoder', base_layers=[18, 64], density_layers=[64, 1],
        color_layers=[64, 3], dir_layers=[16, 64], max_steps=32))
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 6, 8, 8)),
                      jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, 3)))
    p = jax.tree_util.tree_map(np.asarray, params)['params']
    src = {}
    for t_name in ('base_net', 'density_net', 'color_net', 'dir_net'):
        for j, (name, sub) in enumerate(sorted(p[t_name].items())):
            src[f'{t_name}.{2 * j}.weight'] = np.asarray(sub['kernel']).T
            src[f'{t_name}.{2 * j}.bias'] = np.asarray(sub['bias'])
    converted, leftover = convert_decoder(src)
    assert leftover == []
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(converted)[0]}
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v), flat_b[ks], err_msg=ks)
