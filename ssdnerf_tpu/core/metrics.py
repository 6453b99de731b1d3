"""Image quality metrics (jnp, jit-friendly).

Equivalents of /root/reference/lib/core/evaluation/metrics.py: ``eval_psnr``
(metrics.py:52-55), pure Gaussian-filtered ``eval_ssim`` (:74-132) and the
skimage/pixelNeRF-convention SSIM (:58-71) reimplemented without skimage
(uniform 7x7 window, the skimage default for structural_similarity).
"""
import math

import numpy as np
import jax.numpy as jnp
from jax import lax


def eval_psnr(img1, img2, max_val=1.0, eps=1e-6):
    """(N, ...) -> (N,) PSNR per item."""
    mse = jnp.mean((img1 - img2) ** 2, axis=tuple(range(1, img1.ndim)))
    return 10 * (2 * math.log10(max_val) - jnp.log10(mse + eps))


def _gaussian_kernel(size, sigma):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _filter2d_separable(img, k):
    """img (N, C, H, W), k (S,) separable kernel, 'valid' padding."""
    n, c, h, w = img.shape
    S = k.shape[0]
    x = img.reshape(n * c, 1, h, w)
    kh = jnp.asarray(k).reshape(1, 1, S, 1)
    kw = jnp.asarray(k).reshape(1, 1, 1, S)
    x = lax.conv_general_dilated(x, kh, (1, 1), 'VALID')
    x = lax.conv_general_dilated(x, kw, (1, 1), 'VALID')
    return x.reshape(n, c, x.shape[-2], x.shape[-1])


def _ssim_core(img1, img2, filt, max_val, k1, k2):
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map


def eval_ssim(img1, img2, max_val=1.0, filter_size=11, filter_sigma=1.5,
              k1=0.01, k2=0.03):
    """Gaussian-window SSIM on NCHW images -> (N,) per-image scores
    (metrics.py:74-132)."""
    k = _gaussian_kernel(filter_size, filter_sigma)
    filt = lambda x: _filter2d_separable(x, k)
    ssim_map = _ssim_core(img1, img2, filt, max_val, k1, k2)
    return ssim_map.mean(axis=(1, 2, 3))


def eval_ssim_skimage(img1, img2, data_range=1.0):
    """pixelNeRF-convention SSIM (skimage structural_similarity defaults:
    uniform 7x7 window, covariance with ddof-style normalization
    cov_norm = NP/(NP-1)) on NCHW images -> (N,) numpy scores."""
    win = 7
    NP = win ** 2
    cov_norm = NP / (NP - 1)
    k = np.full(win, 1.0 / win, np.float32)
    filt = lambda x: _filter2d_separable(x, k)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ux = filt(img1)
    uy = filt(img2)
    uxx = filt(img1 * img1)
    uyy = filt(img2 * img2)
    uxy = filt(img1 * img2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    ssim_map = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return np.asarray(ssim_map.mean(axis=(1, 2, 3)))
