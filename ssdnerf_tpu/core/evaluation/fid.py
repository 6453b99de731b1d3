"""FID / KID metrics.

Port of the math of mmgen FID + the reference FIDKID
(/root/reference/lib/core/evaluation/metrics.py:135-215): Frechet distance
between Gaussian feature fits, StyleGAN-ADA polynomial-kernel KID (x1000).
Real statistics load from the same pickle format the reference uses
(``{mean, cov, feats_np}``).

The Inception feature extractor is pluggable: the default tries the
torch-scripted StyleGAN Inception network from ``inception_path`` (the file
the reference downloads to work_dirs/cache/inception-2015-12-05.pt); with no
extractor available the metric raises a clear error at feed time.  Any
callable (N, H, W, 3) uint8 -> (N, D) features can be substituted.
"""
import os
import pickle

import numpy as np
import scipy.linalg


class FID:
    name = 'FID'

    def __init__(self, num_images, inception_pkl=None, inception_args=None,
                 bgr2rgb=False, feature_extractor=None, **kwargs):
        self.num_images = num_images
        self.inception_pkl = inception_pkl
        self.inception_args = dict(inception_args or {})
        self.bgr2rgb = bgr2rgb
        self._extractor = feature_extractor
        self.real_mean = None
        self.real_cov = None
        self.real_feats = []
        self.fake_feats = []
        self.num_real_feeded = 0

    # ------------------------------------------------------------ #
    def prepare(self):
        if self.inception_pkl is not None and os.path.isfile(
                self.inception_pkl):
            with open(self.inception_pkl, 'rb') as f:
                ref = pickle.load(f)
            self.real_mean = ref['mean']
            self.real_cov = ref['cov']
            self.real_feats_np = ref.get('feats_np')
            self.num_real_feeded = self.num_images
        else:
            self.real_feats_np = None

    def _get_extractor(self):
        if self._extractor is None:
            path = self.inception_args.get('inception_path')
            jax_npz = self.inception_args.get('inception_npz')
            from .feature_nets import make_inception_extractor
            if jax_npz and os.path.isfile(jax_npz):
                self._extractor = make_inception_extractor(jax_npz)
            elif path and os.path.isfile(path):
                self._extractor = _torchscript_inception(path)
            else:
                # JAX-native net with seeded random weights: valid for
                # relative comparisons, prints a warning
                self._extractor = make_inception_extractor(None)
        return self._extractor

    def feed(self, imgs, mode):
        """imgs: (N, H, W, 3) float [0,1] or uint8."""
        imgs = np.asarray(imgs)
        if imgs.dtype != np.uint8:
            imgs = np.clip(np.round(imgs * 255), 0, 255).astype(np.uint8)
        if self.bgr2rgb:
            imgs = imgs[..., ::-1]
        feats = np.asarray(self._get_extractor()(imgs))
        if mode == 'reals':
            self.real_feats.append(feats)
            self.num_real_feeded += len(feats)
        else:
            self.fake_feats.append(feats)

    # ------------------------------------------------------------ #
    @staticmethod
    def _calc_fid(fake_mean, fake_cov, real_mean, real_cov, eps=1e-6):
        """Frechet distance (mmgen _calc_fid semantics)."""
        cov_sqrt, _ = scipy.linalg.sqrtm(fake_cov @ real_cov, disp=False)
        if not np.isfinite(cov_sqrt).all():
            offset = np.eye(fake_cov.shape[0]) * eps
            cov_sqrt = scipy.linalg.sqrtm(
                (fake_cov + offset) @ (real_cov + offset))
        if np.iscomplexobj(cov_sqrt):
            cov_sqrt = cov_sqrt.real
        mean_diff = fake_mean - real_mean
        mean_norm = float(mean_diff @ mean_diff)
        trace = float(np.trace(fake_cov) + np.trace(real_cov)
                      - 2 * np.trace(cov_sqrt))
        return mean_norm + trace, mean_norm, trace

    @staticmethod
    def _calc_kid(real_feat, fake_feat, num_subsets, max_subset_size,
                  rng=None):
        """StyleGAN-ADA KID (metrics.py:162-188)."""
        rng = rng or np.random
        n = real_feat.shape[1]
        m = min(min(real_feat.shape[0], fake_feat.shape[0]), max_subset_size)
        t = 0
        for _ in range(num_subsets):
            x = fake_feat[rng.choice(fake_feat.shape[0], m, replace=False)]
            y = real_feat[rng.choice(real_feat.shape[0], m, replace=False)]
            a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
            b = (x @ y.T / n + 1) ** 3
            t += (a.sum() - np.diag(a).sum()) / (m - 1) - b.sum() * 2 / m
        return float(t / num_subsets / m)

    def _fake_stats(self):
        fake = np.concatenate(self.fake_feats, axis=0)
        assert fake.shape[0] >= self.num_images, \
            f'got {fake.shape[0]} fake images, need {self.num_images}'
        fake = fake[:self.num_images]
        return fake, np.mean(fake, 0), np.cov(fake, rowvar=False)

    def _real_stats(self):
        if self.real_mean is None:
            feats = np.concatenate(self.real_feats, axis=0)[:self.num_images]
            self.real_feats_np = feats
            self.real_mean = np.mean(feats, 0)
            self.real_cov = np.cov(feats, rowvar=False)

    def _key(self, name):
        """Tag metric keys when the feature net runs substitute (random)
        weights: such values rank variants consistently but are NOT
        comparable to published numbers, and must not look like they are."""
        sub = getattr(self._extractor, 'substitute_weights', False)
        return f'{name}_substitute' if sub else name

    def summary(self):
        self._real_stats()
        _, fake_mean, fake_cov = self._fake_stats()
        fid, mean, cov = self._calc_fid(fake_mean, fake_cov, self.real_mean,
                                        self.real_cov)
        k = self._key('fid')
        self._result_str = f'{k} {fid:.4f} ({mean:.5f}/{cov:.5f})'
        self._result_dict = {k: fid, f'{k}_mean': mean, f'{k}_cov': cov}
        return fid, mean, cov

    def clear(self, clear_reals=False):
        self.fake_feats = []
        if clear_reals:
            self.real_feats = []
            self.num_real_feeded = 0

    @property
    def result_str(self):
        return getattr(self, '_result_str', '')

    @property
    def result_dict(self):
        return getattr(self, '_result_dict', {})


class FIDKID(FID):
    name = 'FIDKID'

    def __init__(self, num_images, num_subsets=100, max_subset_size=1000,
                 **kwargs):
        super().__init__(num_images, **kwargs)
        self.num_subsets = num_subsets
        self.max_subset_size = max_subset_size

    def summary(self):
        self._real_stats()
        fake_np, fake_mean, fake_cov = self._fake_stats()
        fid, mean, cov = self._calc_fid(fake_mean, fake_cov, self.real_mean,
                                        self.real_cov)
        kid = self._calc_kid(self.real_feats_np, fake_np, self.num_subsets,
                             self.max_subset_size) * 1000
        kf, kk = self._key('fid'), self._key('kid')
        self._result_str = (f'{kf} {fid:.4f} ({mean:.5f}/{cov:.5f}), '
                            f'{kk} {kid:.4f}')
        self._result_dict = {kf: fid, f'{kf}_mean': mean, f'{kf}_cov': cov,
                             kk: kid}
        return fid, mean, cov, kid


def _torchscript_inception(path):
    """Wrap the StyleGAN torch-scripted Inception (CPU) as an extractor."""
    import torch
    model = torch.jit.load(path, map_location='cpu').eval()

    def extract(imgs):
        with torch.no_grad():
            x = torch.from_numpy(
                np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)))
            feats = []
            for i in range(0, len(x), 32):
                feats.append(model(
                    x[i:i + 32], return_features=True).numpy())
        return np.concatenate(feats, 0)

    return extract


_METRICS = {'FID': FID, 'FIDKID': FIDKID}


def build_metric(cfg, feature_extractor=None):
    cfg = dict(cfg)
    kind = cfg.pop('type')
    return _METRICS[kind](feature_extractor=feature_extractor, **cfg)
