"""JAX-native perceptual feature networks: FID InceptionV3 and VGG16-LPIPS.

The reference gates FID on a torch-scripted StyleGAN Inception artifact and
LPIPS on the ``lpips`` torch package (lib/core/evaluation/metrics.py:135-215,
base_nerf.py:560-570).  Here both networks are Flax modules (NHWC, bf16-able)
whose parameter trees mirror the torchvision / pytorch-fid / lpips naming,
so real weights convert mechanically with the generic ``load_torch_state``
below when a weights file is available.

Without a weights file the networks fall back to deterministic seeded random
parameters and log a warning: random-feature FID/KID/LPIPS are still valid
*relative* metrics (they rank model variants consistently) but are NOT
comparable to published numbers.  Pass a converted weights ``.npz`` to get
the standard metrics.
"""
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# --------------------------------------------------------------------- #
# building blocks
# --------------------------------------------------------------------- #
class BasicConv2d(nn.Module):
    """conv + frozen BN (eval mode) + relu, torchvision naming."""
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding=[(p, p) for p in self.padding], use_bias=False,
                    name='conv')(x)
        scale = self.param('bn_scale', nn.initializers.ones,
                           (self.features,))
        bias = self.param('bn_bias', nn.initializers.zeros, (self.features,))
        mean = self.param('bn_mean', nn.initializers.zeros, (self.features,))
        var = self.param('bn_var', nn.initializers.ones, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _maxpool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


def _avgpool3(x):
    # count_include_pad=True (torchvision InceptionA/C pool branches use
    # the default; the pytorch-fid variants set include_pad False — the
    # difference only matters at borders and we follow pytorch-fid)
    summed = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                         count_include_pad=False)
    return summed


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name='branch3x3dbl_3')(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name='branch_pool')(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), name='branch3x3dbl_3')(bd)
        return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name='branch7x7dbl_5')(bd)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name='branch7x7x3_4')(b7)
        return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # pytorch-fid InceptionE_2 (last block)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), name='branch3x3_1')(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name='branch3x3_2a')(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name='branch3x3_2b')(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name='branch3x3dbl_2')(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1),
                        name='branch3x3dbl_3a')(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0),
                        name='branch3x3dbl_3b')(bd),
        ], axis=-1)
        if self.use_max_pool:
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=[(1, 1), (1, 1)])
        else:
            pooled = _avgpool3(x)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """FID InceptionV3 -> 2048-d pool3 features.

    Structure and module names follow torchvision/pytorch-fid so real
    weights map 1:1.  Input: (N, 299, 299, 3) in [-1, 1].
    """

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), (2, 2), name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name='Conv2d_2b_3x3')(x)
        x = _maxpool(x)
        x = BasicConv2d(80, (1, 1), name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), name='Conv2d_4a_3x3')(x)
        x = _maxpool(x)
        x = InceptionA(32, name='Mixed_5b')(x)
        x = InceptionA(64, name='Mixed_5c')(x)
        x = InceptionA(64, name='Mixed_5d')(x)
        x = InceptionB(name='Mixed_6a')(x)
        x = InceptionC(128, name='Mixed_6b')(x)
        x = InceptionC(160, name='Mixed_6c')(x)
        x = InceptionC(160, name='Mixed_6d')(x)
        x = InceptionC(192, name='Mixed_6e')(x)
        x = InceptionD(name='Mixed_7a')(x)
        x = InceptionE(name='Mixed_7b')(x)
        x = InceptionE(use_max_pool=True, name='Mixed_7c')(x)
        return jnp.mean(x, axis=(1, 2))  # (N, 2048)


# --------------------------------------------------------------------- #
# VGG16 LPIPS
# --------------------------------------------------------------------- #
_VGG_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
            512, 512, 512, 'M', 512, 512, 512]
_LPIPS_TAPS = (3, 8, 15, 22, 29)  # relu1_2, 2_2, 3_3, 4_3, 5_3 (torch idx)
_LPIPS_CH = (64, 128, 256, 512, 512)


class VGG16LPIPS(nn.Module):
    """LPIPS(net='vgg'): VGG16 features, channel-unit-normalized, squared
    diffs weighted by learned 1x1 'lin' layers, spatially averaged, summed.

    Input: two (N, H, W, 3) batches in [0, 1].  Parameter names mirror the
    lpips package (``net.slice*`` convs are named ``conv{i}`` by torch
    features index; ``lin{k}`` heads).
    """

    @nn.compact
    def __call__(self, a, b):
        # lpips 'imagenet-normalized' scaling: inputs to [-1,1] then shift
        shift = jnp.asarray([-.030, -.088, -.188])
        scale = jnp.asarray([.458, .448, .450])

        def norm_in(x):
            return (2 * x - 1 - shift) / scale

        convs = {}
        idx = 0
        for c in _VGG_CFG:
            if c == 'M':
                idx += 1
                continue
            convs[idx] = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                                 name=f'conv{idx}')
            idx += 2

        def features(x):
            feats = []
            idx = 0
            tap = 0
            for c in _VGG_CFG:
                if c == 'M':
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                    idx += 1
                    continue
                x = jax.nn.relu(convs[idx](x))
                idx += 2
                if tap < len(_LPIPS_TAPS) and idx - 1 == _LPIPS_TAPS[tap]:
                    nrm = jnp.sqrt(jnp.sum(x ** 2, axis=-1,
                                           keepdims=True)) + 1e-10
                    feats.append(x / nrm)
                    tap += 1
            return feats

        feats_a = features(norm_in(a))
        feats_b = features(norm_in(b))
        total = 0.0
        for k, (fa, fb) in enumerate(zip(feats_a, feats_b)):
            w = self.param(f'lin{k}', nn.initializers.ones,
                           (1, 1, 1, fa.shape[-1]))
            d = (fa - fb) ** 2
            total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1),
                                     axis=(1, 2))
        return total  # (N,)


# --------------------------------------------------------------------- #
# weight loading
# --------------------------------------------------------------------- #
def load_torch_state(init_params, torch_state, conv_name='conv',
                     prefix_map=None):
    """Generic torch state_dict -> flax params for modules whose names
    mirror the torch module tree.  Conv weights (O,I,kH,kW)->(kH,kW,I,O);
    BN tensors map to the bn_* params of BasicConv2d."""
    from flax import serialization
    flat = {}
    for k, v in torch_state.items():
        v = np.asarray(v)
        parts = k.split('.')
        if prefix_map:
            for old, new in prefix_map.items():
                if k.startswith(old):
                    parts = (new + k[len(old):]).split('.')
                    break
        if len(parts) == 1:
            flat[tuple(parts)] = v          # bare param (lpips lin heads)
        elif parts[-2:] == ['conv', 'weight']:
            flat[tuple(parts[:-1]) + ('kernel',)] = v.transpose(2, 3, 1, 0)
        elif parts[-2] == 'bn':
            name = {'weight': 'bn_scale', 'bias': 'bn_bias',
                    'running_mean': 'bn_mean',
                    'running_var': 'bn_var'}.get(parts[-1])
            if name is None:
                continue
            flat[tuple(parts[:-2]) + (name,)] = v
        elif parts[-1] == 'weight' and v.ndim == 4:
            flat[tuple(parts[:-1]) + ('kernel',)] = v.transpose(2, 3, 1, 0)
        elif parts[-1] == 'bias':
            flat[tuple(parts[:-1]) + ('bias',)] = v
        else:
            continue
    tree = {}
    for path, v in flat.items():
        d = tree
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = v
    return serialization.from_state_dict(init_params, {'params': tree})


def make_inception_extractor(weights_path=None, batch=32):
    """Returns extract(imgs_uint8 NHW3) -> (N, 2048) np features."""
    model = InceptionV3Features()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 299, 299, 3), jnp.float32))
    if weights_path is not None:
        d = np.load(weights_path, allow_pickle=True)
        params = load_torch_state(params, {k: d[k] for k in d.files})
    else:
        warnings.warn(
            'InceptionV3 running with seeded RANDOM weights: FID/KID values '
            'are valid for relative comparison only, not against published '
            'numbers. Convert real weights with tools/convert_vision_nets.py.')

    @jax.jit
    def run(x):
        return model.apply(params, x)

    def extract(imgs):
        imgs = np.asarray(imgs)
        out = []
        for i in range(0, len(imgs), batch):
            chunk = imgs[i:i + batch].astype(np.float32) / 255.0
            x = jax.image.resize(
                jnp.asarray(chunk), (len(chunk), 299, 299, 3), 'bilinear')
            out.append(np.asarray(run(x * 2.0 - 1.0)))
        return np.concatenate(out, axis=0)

    # metric code tags result keys (fid_substitute/...) off this flag so
    # relative-only numbers cannot masquerade as published-comparable ones
    extract.substitute_weights = weights_path is None
    return extract


def make_lpips(weights_path=None):
    """Returns lpips(a, b) -> (N,) for NHW3 float [0,1] batches."""
    model = VGG16LPIPS()
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    if weights_path is not None:
        d = np.load(weights_path, allow_pickle=True)
        params = load_torch_state(params, {k: d[k] for k in d.files})
    else:
        warnings.warn(
            'VGG16-LPIPS running with seeded RANDOM weights: values are '
            'valid for relative comparison only. Convert real weights with '
            'tools/convert_vision_nets.py.')

    @jax.jit
    def run(a, b):
        return model.apply(params, a, b)

    def lpips_fn(a, b):
        return np.asarray(run(jnp.asarray(a, jnp.float32),
                              jnp.asarray(b, jnp.float32)))

    lpips_fn.substitute_weights = weights_path is None
    return lpips_fn
