"""FID statistics + Frechet distance.

Re-implements both FID flavors of the reference (SURVEY.md §3.3 note):
  - the standalone-eval flavor (reference scripts/evaluate_fid_lpips.py:
    261-267 / pytorch_fid calculate_frechet_distance), and
  - the training-time FeatureStats machinery with f64 streaming mean/cov and
    an on-disk cache (reference lib/evaluator/stylegan_metrics/
    metric_utils.py:55-137,204-231).

Feature extraction is pluggable (InceptionV3 from .inception by default).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional, Tuple

import numpy as np
from scipy import linalg


class FeatureStats:
    """Streaming mean/cov accumulation in float64
    (reference metric_utils.py:55-137)."""

    def __init__(self, capture_mean_cov: bool = True,
                 max_items: Optional[int] = None):
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features: Optional[int] = None
        self.raw_mean: Optional[np.ndarray] = None
        self.raw_cov: Optional[np.ndarray] = None

    def set_num_features(self, num_features: int):
        if self.num_features is not None:
            assert num_features == self.num_features
        else:
            self.num_features = num_features
            self.raw_mean = np.zeros([num_features], np.float64)
            self.raw_cov = np.zeros([num_features, num_features], np.float64)

    def is_full(self) -> bool:
        return (self.max_items is not None
                and self.num_items >= self.max_items)

    def append(self, x: np.ndarray):
        x = np.asarray(x, np.float64)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items + x.shape[0] > self.max_items:
                if self.num_items >= self.max_items:
                    return
                x = x[:self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_mean_cov:
            self.raw_mean += x.sum(axis=0)
            self.raw_cov += x.T @ x

    def get_mean_cov(self) -> Tuple[np.ndarray, np.ndarray]:
        assert self.capture_mean_cov and self.num_items > 0
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items
        cov = cov - np.outer(mean, mean)
        return mean, cov

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.__dict__, f)

    @staticmethod
    def load(path: str) -> "FeatureStats":
        with open(path, "rb") as f:
            state = pickle.load(f)
        obj = FeatureStats()
        obj.__dict__.update(state)
        return obj


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """pytorch_fid-compatible Frechet distance
    (reference: frechet_inception_distance.py:52-55 uses the same formula
    via scipy.linalg.sqrtm)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_feature_arrays(real: np.ndarray, fake: np.ndarray) -> float:
    """The standalone-eval flavor: full activation arrays -> np.mean/np.cov
    (reference evaluate_fid_lpips.py:263-267)."""
    mu_r, sig_r = np.mean(real, axis=0), np.cov(real, rowvar=False)
    mu_f, sig_f = np.mean(fake, axis=0), np.cov(fake, rowvar=False)
    return frechet_distance(mu_r, sig_r, mu_f, sig_f)


def stats_cache_path(cache_dir: str, dataset_tag: str, detector_tag: str,
                     num_items: Optional[int]) -> str:
    """md5-keyed dataset-stats cache (reference metric_utils.py:204-231)."""
    key = f"{dataset_tag}-{detector_tag}-{num_items}"
    digest = hashlib.md5(key.encode()).hexdigest()
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"fid-stats-{digest}.pkl")
