"""Training-time metric registry — fidNk_full_inpainting et al.

Re-implements the capability of the reference StyleGAN-ADA metric stack
(reference: lib/evaluator/stylegan_metrics/metric_main.py:24-117,
metric_utils.py:197-296): a name->fn registry, dataset feature stats with an
md5-keyed disk cache, generator-composite feature stats, Frechet distance,
timing, and jsonl reporting.

The detector is pluggable: pass `detector_fn` (jitted NHWC [0,1] ->
features) built from evalx.inception with imported weights. Rank-0
broadcast of results (metric_main.py:60-65) is unnecessary in the
single-controller model.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

from .fid import FeatureStats, frechet_distance, stats_cache_path

_METRICS: Dict[str, Callable] = {}


def register_metric(fn):
    _METRICS[fn.__name__] = fn
    return fn


def is_valid_metric(name: str) -> bool:
    return name in _METRICS


def list_valid_metrics():
    return list(_METRICS.keys())


def calc_metric(metric: str, **kwargs) -> Dict[str, Any]:
    """reference metric_main.py:37-65 (timing + packaging)."""
    assert is_valid_metric(metric), metric
    start = time.time()
    results = _METRICS[metric](**kwargs)
    return {
        "results": results,
        "metric": metric,
        "total_time": time.time() - start,
    }


def report_metric(result_dict: Dict[str, Any], run_dir: Optional[str] = None,
                  snapshot_pkl: Optional[str] = None) -> None:
    """reference metric_main.py:68-88 (jsonl sink)."""
    metric = result_dict["metric"]
    line = json.dumps({**result_dict, "snapshot_pkl": snapshot_pkl,
                       "timestamp": time.time()})
    print(line)
    if run_dir is not None and os.path.isdir(run_dir):
        with open(os.path.join(run_dir, f"metric-{metric}.jsonl"), "at") as f:
            f.write(line + "\n")


def compute_feature_stats_for_dataset(
    dataset, detector_fn, detector_tag: str, batch_size: int = 32,
    max_items: Optional[int] = None, cache_dir: Optional[str] = None,
    dataset_tag: str = "",
) -> FeatureStats:
    """Real-image features with disk cache
    (reference metric_utils.py:197-253). Dataset items are (x, mask, uid)
    with x NHWC in [-1,1]."""
    if cache_dir is not None:
        path = stats_cache_path(cache_dir, dataset_tag, detector_tag,
                                max_items)
        if os.path.isfile(path):
            return FeatureStats.load(path)

    import jax.numpy as jnp

    stats = FeatureStats(max_items=max_items)
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size,
                                                      n))]
        imgs = np.stack([it[0] for it in items])
        imgs01 = np.clip(imgs * 0.5 + 0.5, 0, 1)
        stats.append(np.asarray(detector_fn(jnp.asarray(imgs01))))
        if stats.is_full():
            break
    if cache_dir is not None:
        stats.save(path)
    return stats


def compute_feature_stats_for_inpainting(
    dataset, generator_fn, detector_fn, batch_size: int = 32,
    max_items: Optional[int] = None,
) -> FeatureStats:
    """Generator-composite features (reference metric_utils.py:256-296):
    run G on [mask-0.5, img*mask], composite with the real image, detect."""
    import jax.numpy as jnp

    stats = FeatureStats(max_items=max_items)
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size,
                                                      n))]
        imgs = jnp.asarray(np.stack([it[0] for it in items]))
        masks = jnp.asarray(np.stack([it[1] for it in items])[..., None])
        x = jnp.concatenate([masks - 0.5, imgs * masks], axis=-1)
        out = generator_fn(x)
        composed = imgs * masks + out * (1 - masks)
        comp01 = jnp.clip(composed * 0.5 + 0.5, 0, 1)
        stats.append(np.asarray(detector_fn(comp01)))
        if stats.is_full():
            break
    return stats


def _fid_full_inpainting(num_items, *, dataset, generator_fn, detector_fn,
                         detector_tag="inception", batch_size=32,
                         cache_dir=None, dataset_tag="",
                         max_items=None) -> Dict[str, float]:
    # max_items: optional external cap below the metric's nominal item
    # count (eval.max_items in training configs — smoke runs / tiny
    # validation sets); None keeps the registered protocol count.
    n = num_items if max_items is None else min(num_items, max_items)
    real = compute_feature_stats_for_dataset(
        dataset, detector_fn, detector_tag, batch_size, n,
        cache_dir, dataset_tag)
    fake = compute_feature_stats_for_inpainting(
        dataset, generator_fn, detector_fn, batch_size, n)
    mu_r, sig_r = real.get_mean_cov()
    mu_f, sig_f = fake.get_mean_cov()
    return {"fid": frechet_distance(mu_f, sig_f, mu_r, sig_r)}


# reference metric_main.py:93-117 registers fid{5k,10k,36500,50k}
@register_metric
def fid5k_full_inpainting(**kw):
    return _fid_full_inpainting(5000, **kw)


@register_metric
def fid10k_full_inpainting(**kw):
    return _fid_full_inpainting(10000, **kw)


@register_metric
def fid36500_full_inpainting(**kw):
    return _fid_full_inpainting(36500, **kw)


@register_metric
def fid50k_full_inpainting(**kw):
    return _fid_full_inpainting(50000, **kw)
