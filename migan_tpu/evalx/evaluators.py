"""Composable metric evaluators (psnr / ssim / lpips / null).

Re-implements the capability of the reference evaluator pipeline
(reference: lib/evaluator/eva_base.py:22-290 and the psnr/ssim/lpips/null
plug-ins). Key simplification: the reference hand-rolls cross-rank result
gathering with 3 broadcasts per rank plus `zipzap_arrange` re-interleaving
(eva_base.py:87-216); here evaluation is fed by the shard-extend sampler
(data.sampler.ShardSampler) and results are plain numpy on host — with a
single process per host and jax process_allgather when multi-host.

All image tensors NHWC float.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_EVALUATORS: Dict[str, type] = {}


def register(name: str):
    def deco(cls):
        _EVALUATORS[name] = cls
        return cls
    return deco


def get_evaluator(cfg) -> "base_evaluator":
    """cfg: list of {type, args} -> composed evaluator, or single dict."""
    if isinstance(cfg, (list, tuple)):
        evs = [_EVALUATORS[c["type"]](**c.get("args") or {}) for c in cfg]
        return compose_evaluator(evs)
    return _EVALUATORS[cfg["type"]](**cfg.get("args") or {})


class base_evaluator:
    symbol = "base"

    def __init__(self):
        self.final: Dict[str, float] = {}
        self.sample_n: Optional[int] = None

    def set_sample_n(self, n: int):
        self.sample_n = n

    def add_batch(self, pred, gt, fn=None, **kw):
        raise NotImplementedError

    def compute(self):
        raise NotImplementedError

    def one_line_summary(self) -> str:
        return " ".join(f"{k}={v:.4f}" for k, v in self.final.items())

    def clear_data(self):
        pass


class compose_evaluator(base_evaluator):
    """Run several evaluators over the same batches
    (reference eva_base.py:245-290)."""

    def __init__(self, evaluators: List[base_evaluator]):
        super().__init__()
        self.evaluators = evaluators

    def set_sample_n(self, n):
        for e in self.evaluators:
            e.set_sample_n(n)

    def add_batch(self, pred, gt, fn=None, **kw):
        for e in self.evaluators:
            e.add_batch(pred, gt, fn=fn, **kw)

    def compute(self):
        out = {}
        for e in self.evaluators:
            e.compute()
            out.update(e.final)
        self.final = out
        return out

    def clear_data(self):
        for e in self.evaluators:
            e.clear_data()


@register("null")
class null_evaluator(base_evaluator):
    """reference lib/evaluator/eva_null.py."""

    symbol = "null"

    def add_batch(self, pred, gt, fn=None, **kw):
        pass

    def compute(self):
        self.final = {}
        return None


@register("psnr")
class psnr_evaluator(base_evaluator):
    """reference lib/evaluator/eva_psnr.py:8-85 (NHWC layout)."""

    symbol = "psnr"

    def __init__(self, for_dataset=None, scale=2, rgb_range=1):
        super().__init__()
        self.for_dataset = for_dataset
        self.scale = scale
        self.rgb_range = rgb_range
        self.vals: List[np.ndarray] = []

    def add_batch(self, pred, gt, fn=None, **kw):
        diff = (np.asarray(pred) - np.asarray(gt)) / self.rgb_range
        if self.for_dataset is None:
            valid = diff
        elif self.for_dataset == "benchmark":
            shave = self.scale
            gray = np.array([65.738, 129.057, 25.064]) / 256
            diff = (diff * gray[None, None, None, :]).sum(-1)
            valid = diff[:, shave:-shave, shave:-shave]
        elif self.for_dataset == "div2k":
            shave = self.scale + 6
            valid = diff[:, shave:-shave, shave:-shave, :]
        else:
            raise NotImplementedError(self.for_dataset)
        axes = tuple(range(1, valid.ndim))
        mse = (valid ** 2).mean(axis=axes)
        self.vals.append(-10 * np.log10(mse))

    def compute(self):
        v = np.concatenate(self.vals)[: self.sample_n]
        self.final["psnr"] = float(v.mean())
        return self.final["psnr"]

    def clear_data(self):
        self.vals = []


def _gaussian_window(window_size=11, sigma=1.5):
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def ssim_nhwc(img1: jnp.ndarray, img2: jnp.ndarray,
              window_size: int = 11) -> jnp.ndarray:
    """Gaussian-window SSIM per image (reference eva_ssim.py:21-41)."""
    C = img1.shape[-1]
    w = jnp.asarray(_gaussian_window(window_size))
    w = jnp.tile(w[:, :, None, None], (1, 1, 1, C)).astype(img1.dtype)
    pad = window_size // 2

    def f(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = f(img1 * img1) - mu1_sq
    s2 = f(img2 * img2) - mu2_sq
    s12 = f(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(m, axis=(1, 2, 3))


@register("ssim")
class ssim_evaluator(base_evaluator):
    symbol = "ssim"

    def __init__(self, window_size=11):
        super().__init__()
        self.window_size = window_size
        self.vals: List[np.ndarray] = []

    def add_batch(self, pred, gt, fn=None, **kw):
        v = ssim_nhwc(jnp.asarray(pred), jnp.asarray(gt), self.window_size)
        self.vals.append(np.asarray(v))

    def compute(self):
        v = np.concatenate(self.vals)[: self.sample_n]
        self.final["ssim"] = float(v.mean())
        return self.final["ssim"]

    def clear_data(self):
        self.vals = []


@register("lpips")
class lpips_evaluator(base_evaluator):
    """reference lib/evaluator/eva_lpips.py:11-82; needs imported weights
    (set via `params`) for meaningful numbers."""

    symbol = "lpips"

    def __init__(self, params=None, net="alex"):
        super().__init__()
        assert net == "alex", "only the alex backbone is implemented"
        from .lpips import lpips_apply, lpips_init

        if params is None:
            params = lpips_init(jax.random.PRNGKey(0))
        self._apply = jax.jit(
            lambda a, b: lpips_apply(params, a, b, normalize=False))
        self.vals: List[np.ndarray] = []

    def add_batch(self, pred, gt, fn=None, **kw):
        # reference eva_lpips feeds [-1,1] tensors with normalize=False
        v = self._apply(jnp.asarray(pred), jnp.asarray(gt))
        self.vals.append(np.asarray(v))

    def compute(self):
        v = np.concatenate(self.vals)[: self.sample_n]
        self.final["lpips"] = float(v.mean())
        return self.final["lpips"]

    def clear_data(self):
        self.vals = []
