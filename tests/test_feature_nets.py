"""JAX-native Inception-FID / VGG-LPIPS: end-to-end numbers + converter."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssdnerf_tpu.core.evaluation.feature_nets import (
    InceptionV3Features, VGG16LPIPS, make_inception_extractor, make_lpips,
    load_torch_state)
from ssdnerf_tpu.core.evaluation.fid import FIDKID


def test_inception_shapes_and_param_names():
    model = InceptionV3Features()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 299, 299, 3)))
    flat = {'.'.join(str(k.key) for k in path): v.shape for path, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    # torchvision-mirroring names exist with the right shapes
    assert flat['params.Conv2d_1a_3x3.conv.kernel'] == (3, 3, 3, 32)
    assert flat['params.Mixed_5b.branch5x5_2.conv.kernel'] == (5, 5, 48, 64)
    assert flat['params.Mixed_6b.branch7x7_2.conv.kernel'] == (1, 7, 128, 128)
    assert flat['params.Mixed_7c.branch_pool.bn_mean'] == (192,)
    # total params ~ 21.8M (torchvision InceptionV3 minus fc/aux)
    n = sum(int(np.prod(s)) for s in flat.values())
    assert 20e6 < n < 25e6, n
    out = model.apply(params, jnp.zeros((2, 299, 299, 3)))
    assert out.shape == (2, 2048)


def test_load_torch_state_roundtrip_inception_names():
    """A state_dict with torchvision key names and shapes loads exactly."""
    model = InceptionV3Features()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    rng = np.random.RandomState(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    torch_sd = {}
    for path, v in flat:
        keys = [str(k.key) for k in path][1:]  # drop 'params'
        mod = '.'.join(keys[:-1])
        leaf = keys[-1]
        val = rng.randn(*v.shape).astype(np.float32)
        if leaf == 'kernel':
            torch_sd[f'{mod}.weight'] = val.transpose(3, 2, 0, 1)
        else:
            name = {'bn_scale': 'bn.weight', 'bn_bias': 'bn.bias',
                    'bn_mean': 'bn.running_mean',
                    'bn_var': 'bn.running_var'}[leaf]
            torch_sd[f'{mod}.{name}'] = val
    loaded = load_torch_state(params, torch_sd)
    for path, v in jax.tree_util.tree_flatten_with_path(loaded)[0]:
        keys = [str(k.key) for k in path][1:]
        mod, leaf = '.'.join(keys[:-1]), keys[-1]
        if leaf == 'kernel':
            ref = torch_sd[f'{mod}.weight'].transpose(2, 3, 1, 0)
        else:
            name = {'bn_scale': 'bn.weight', 'bn_bias': 'bn.bias',
                    'bn_mean': 'bn.running_mean',
                    'bn_var': 'bn.running_var'}[leaf]
            ref = torch_sd[f'{mod}.{name}']
        np.testing.assert_array_equal(np.asarray(v), ref)


def test_fid_kid_produce_numbers_with_jax_extractor():
    rng = np.random.RandomState(0)
    reals = rng.randint(0, 255, (24, 64, 64, 3), np.uint8)
    fakes_close = reals + rng.randint(-5, 5, reals.shape).astype(np.uint8)
    fakes_far = rng.randint(0, 255, (24, 64, 64, 3), np.uint8) // 4

    metric = FIDKID(num_images=24, num_subsets=4, max_subset_size=16,
                    inception_args={})
    metric.prepare()
    metric.feed(reals, 'reals')
    metric.feed(fakes_close, 'fakes')
    metric.summary()
    res_close = metric.result_dict
    metric.clear()
    metric.feed(fakes_far, 'fakes')
    metric.summary()
    res_far = metric.result_dict
    # substitute (random) weights => tagged keys so the numbers cannot
    # masquerade as published-comparable FID/KID
    assert 'fid' not in res_close and 'kid' not in res_close
    assert np.isfinite(res_close['fid_substitute'])
    assert np.isfinite(res_far['fid_substitute'])
    assert np.isfinite(res_close['kid_substitute'])
    assert np.isfinite(res_far['kid_substitute'])
    # random-feature FID still orders close < far
    assert res_close['fid_substitute'] < res_far['fid_substitute']


def test_lpips_jax_orders_perturbations():
    lp = make_lpips(None)
    rng = np.random.RandomState(1)
    a = rng.rand(2, 64, 64, 3).astype(np.float32)
    same = lp(a, a)
    near = lp(a, np.clip(a + 0.02 * rng.randn(*a.shape), 0, 1))
    far = lp(a, rng.rand(*a.shape).astype(np.float32))
    assert np.allclose(same, 0, atol=1e-5)
    assert (near < far).all()
