"""Native batched PNG decoder (ssdnerf_tpu/data/pngdec.c) vs cv2 oracle.

The decoder must be byte-exact with cv2.imread(IMREAD_COLOR)[..., ::-1]
for every PNG flavor the SRN datasets can contain (8-bit RGB, RGBA,
grayscale, 16-bit), and must fail safely (None -> cv2 fallback) on
mixed-size batches and non-PNG inputs."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from ssdnerf_tpu.data import native_png  # noqa: E402


pytestmark = pytest.mark.skipif(native_png.get_lib() is None,
                                reason='no C compiler / libpng')


def _write_variants(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    rgb = rng.randint(0, 255, (32, 48, 3), np.uint8)
    p = str(tmp_path / 'rgb.png'); cv2.imwrite(p, rgb); paths.append(p)
    rgba = rng.randint(0, 255, (32, 48, 4), np.uint8)
    p = str(tmp_path / 'rgba.png'); cv2.imwrite(p, rgba); paths.append(p)
    gray = rng.randint(0, 255, (32, 48), np.uint8)
    p = str(tmp_path / 'gray.png'); cv2.imwrite(p, gray); paths.append(p)
    deep = rng.randint(0, 65535, (32, 48, 3), np.uint16)
    p = str(tmp_path / 'u16.png'); cv2.imwrite(p, deep); paths.append(p)
    return paths


def test_decode_batch_matches_cv2(tmp_path):
    paths = _write_variants(tmp_path)
    out = native_png.decode_batch(paths, num_threads=4)
    assert out is not None and out.shape == (len(paths), 32, 48, 3)
    ref = np.stack([cv2.imread(p, cv2.IMREAD_COLOR)[..., ::-1]
                    for p in paths])
    np.testing.assert_array_equal(out, ref)


def test_decode_batch_dims_and_failures(tmp_path):
    paths = _write_variants(tmp_path)
    assert native_png.png_dims(paths[0]) == (32, 48)
    # mixed sizes: first image sets the batch shape, others must refuse
    odd = str(tmp_path / 'odd.png')
    cv2.imwrite(odd, np.zeros((16, 16, 3), np.uint8))
    assert native_png.decode_batch([paths[0], odd]) is None
    # non-PNG input
    bad = str(tmp_path / 'bad.png')
    with open(bad, 'wb') as f:
        f.write(b'not a png at all')
    assert native_png.png_dims(bad) is None
    assert native_png.decode_batch([bad]) is None
    assert native_png.decode_batch([]) is None


def test_dataset_read_imgs_native(tmp_path):
    """ShapeNetSRN._read_imgs returns identical pixels through the native
    batch path, the cached path, and the per-file cv2 fallback."""
    from ssdnerf_tpu.data.shapenet_srn import ShapeNetSRN
    rng = np.random.RandomState(1)
    scene = tmp_path / 'scene000'
    (scene / 'rgb').mkdir(parents=True)
    (scene / 'pose').mkdir()
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 2.0
    for v in range(4):
        np.savetxt(str(scene / 'pose' / f'{v:06d}.txt'),
                   pose.reshape(1, 16), fmt='%f')
        cv2.imwrite(str(scene / 'rgb' / f'{v:06d}.png'),
                    rng.randint(0, 255, (24, 24, 3), np.uint8))
    with open(str(scene / 'intrinsics.txt'), 'w') as f:
        f.write('30.0 12.0 12.0 0.\n0. 0. 0.\n1.\n24 24\n')
    ds = ShapeNetSRN(data_prefix=str(tmp_path))
    paths = ds.scenes[0]['image_paths']
    native = ds._read_imgs(paths)
    fallback = np.stack([ds._read_img(p) for p in paths])
    np.testing.assert_array_equal(native, fallback)
    cached = ShapeNetSRN(data_prefix=str(tmp_path), cache_decoded=True)
    np.testing.assert_array_equal(cached._read_imgs(paths), native)
    assert len(cached._img_cache) == len(paths)
    np.testing.assert_array_equal(cached._read_imgs(paths), native)
