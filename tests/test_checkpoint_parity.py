"""Checkpoint-import parity against the REAL reference naming scheme.

Builds the torch fixture transcribed from the reference's construction code
(tests/torch_mmgen_fixture.py), converts its ``state_dict()`` with
tools/convert_checkpoint.py, and asserts forward parity with our Flax
modules — this fails if any mmgen key name, Sequential index, tensor layout
or math convention (sinusoidal embedding order, qkv head split, attention
residual point) is guessed wrong.
"""
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, 'tools'))

import convert_checkpoint as cc  # noqa: E402

torch = pytest.importorskip('torch')


UNET_CFG = dict(image_size=32, in_channels=6, base_channels=32,
                channels_cfg=[1, 2], resblocks_per_downsample=2,
                num_timesteps=1000, use_rescale_timesteps=True,
                dropout=0.0, use_scale_shift_norm=True, num_heads=4,
                downsample_conv=True, upsample_conv=True,
                attention_res=[16])


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return module


def _to_np_sd(module):
    return {k: v.numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize('groups', [1, 3])
def test_unet_checkpoint_forward_parity(groups):
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from tests.torch_mmgen_fixture import DenoisingUnetMod
    from ssdnerf_tpu.models.architecture.unet import DenoisingUnet

    cfg = dict(UNET_CFG, groups=groups)
    if groups == 3:
        cfg.update(in_channels=6, base_channels=96, num_heads=4)
    tmodel = _randomize(DenoisingUnetMod(**cfg)).eval()
    src = _to_np_sd(tmodel)

    params, leftover = cc.convert_unet(dict(src), dict(cfg))
    assert not leftover, leftover[:10]

    jmodel = DenoisingUnet(
        image_size=(cfg['image_size'],) * 2, in_channels=cfg['in_channels'],
        base_channels=cfg['base_channels'],
        channels_cfg=tuple(cfg['channels_cfg']),
        resblocks_per_downsample=cfg['resblocks_per_downsample'],
        use_scale_shift_norm=cfg['use_scale_shift_norm'],
        num_heads=cfg['num_heads'], attention_res=tuple(cfg['attention_res']),
        groups=groups)
    rng = np.random.RandomState(1)
    x = rng.randn(2, cfg['in_channels'], 32, 32).astype(np.float32)
    t = np.array([17, 500], np.int64)

    init = jmodel.init(jax.random.PRNGKey(0),
                       jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    # exact structural match (names + shapes)
    ref_flat = {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(init)[0]}
    new_flat = {jax.tree_util.keystr(k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == new_flat, (
        sorted(set(ref_flat) ^ set(new_flat))[:10] or 'shape mismatch')
    loaded = serialization.from_state_dict(init, params)

    with torch.no_grad():
        y_t = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    y_j = np.asarray(jmodel.apply(
        loaded, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)))
    y_j = y_j.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-3)


def test_decoder_checkpoint_forward_parity():
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from ssdnerf_tpu.models import TriPlaneDecoder

    # torch fixture of the reference decoder MLPs
    # (/root/reference/lib/models/decoders/triplane_decoder.py:57-90)
    class TorchDec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.base_net = torch.nn.Sequential(torch.nn.Linear(18, 64))
            self.density_net = torch.nn.Sequential(torch.nn.Linear(64, 1))
            self.dir_net = torch.nn.Sequential(torch.nn.Linear(16, 64))
            self.color_net = torch.nn.Sequential(torch.nn.Linear(64, 3))

    tdec = _randomize(TorchDec(), seed=2)
    src = _to_np_sd(tdec)
    params, leftover = cc.convert_decoder(dict(src))
    assert not leftover, leftover

    dec = TriPlaneDecoder(backend='xla', compute_dtype='float32')
    rng = np.random.RandomState(3)
    code = jnp.asarray(rng.randn(1, 3, 6, 128, 128).astype(np.float32)) * 0.5
    xyz = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)).astype(np.float32))
    dirs = rng.randn(1, 64, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    init = dec.init(jax.random.PRNGKey(0), code, xyz, dirs)
    loaded = serialization.from_state_dict(init, params)
    sig, rgb = dec.apply(loaded, code, xyz, dirs)

    # torch-side forward using the same sampled features as the oracle:
    from ssdnerf_tpu.ops import sample_triplane, sh_encode, trunc_exp
    feats = jax.vmap(lambda c, x: sample_triplane(c, x))(code, xyz)
    with torch.no_grad():
        ft = torch.from_numpy(np.asarray(feats))
        base = tdec.base_net(ft)
        silu = torch.nn.functional.silu
        sig_t = torch.exp(tdec.density_net(silu(base))).squeeze(-1)
        sh = torch.from_numpy(np.asarray(sh_encode(dirs, 4)))
        dir_out = tdec.dir_net(sh)
        rgb_t = torch.sigmoid(tdec.color_net(silu(base + dir_out)))
        rgb_t = rgb_t * (1 + 0.001 * 2) - 0.001
    np.testing.assert_allclose(np.asarray(sig), sig_t.numpy(), rtol=2e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(rgb), rgb_t.numpy(), atol=5e-3)


def test_flagship_unet_names_enumerate_exactly():
    """The converter consumes every key of the flagship-config fixture and
    produces every key of our flagship UNet (name-level completeness)."""
    import jax
    from tests.torch_mmgen_fixture import DenoisingUnetMod
    from ssdnerf_tpu.models.architecture.unet import DenoisingUnet
    import jax.numpy as jnp

    cfg = dict(image_size=128, in_channels=18, base_channels=128,
               channels_cfg=[1, 2, 2, 4, 4], resblocks_per_downsample=2,
               dropout=0.0, use_scale_shift_norm=True, num_heads=4,
               attention_res=[32, 16, 8])
    tmodel = DenoisingUnetMod(**cfg)
    src = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, leftover = cc.convert_unet(src, cfg)
    assert not leftover, leftover[:10]

    jmodel = DenoisingUnet(image_size=(128, 128), in_channels=18,
                           base_channels=128, channels_cfg=(1, 2, 2, 4, 4),
                           resblocks_per_downsample=2,
                           use_scale_shift_norm=True, num_heads=4,
                           attention_res=(32, 16, 8))
    init = jax.eval_shape(
        lambda: jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 128, 128, 18)),
                            jnp.zeros((1,), jnp.int32)))
    ref_flat = {jax.tree_util.keystr(k): tuple(v.shape) for k, v in
                jax.tree_util.tree_flatten_with_path(init)[0]}
    new_flat = {jax.tree_util.keystr(k): tuple(v.shape) for k, v in
                jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_flat == new_flat, sorted(set(ref_flat) ^ set(new_flat))[:10]
