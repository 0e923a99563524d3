"""Plug-in data factory: dataset / loader / formatter registries.

Re-implements the capability of the reference data factory
(reference: lib/data_factory/common/ds_base.py:11-129, ds_loader.py:17-92,
ds_formatter.py:11-30): a dataset is a list of load-info dicts, run through a
chain of loaders, then a formatter. Torch-free — everything is numpy NHWC,
feeding jax.device_put directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

_DATASETS: Dict[str, type] = {}
_LOADERS: Dict[str, type] = {}
_FORMATTERS: Dict[str, type] = {}


def regdataset(name: Optional[str] = None):
    def deco(cls):
        _DATASETS[name or cls.__name__] = cls
        return cls
    return deco


def regloader(name: Optional[str] = None):
    def deco(cls):
        _LOADERS[name or cls.__name__] = cls
        return cls
    return deco


def regformat(name: Optional[str] = None):
    def deco(cls):
        _FORMATTERS[name or cls.__name__] = cls
        return cls
    return deco


def get_dataset(cfg: Dict[str, Any]):
    """Construct a dataset from a config dict
    (reference ds_base.py:62-90 `get_dataset()(cfg)`).

    cfg keys: type, plus dataset-specific args; 'loader' is a list of
    {type, args} dicts; 'formatter' is a {type, args} dict.
    """
    # lazy-import built-in dataset modules so registration happens
    from . import ds_places2, ds_ffhq  # noqa: F401

    cls = _DATASETS[cfg["type"]]
    return cls(cfg)


class ds_base:
    """Dataset = load_info list + loader chain + formatter
    (reference ds_base.py:11-59)."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        self.init_load_info(cfg)
        self.loaders = []
        for lcfg in cfg.get("loader") or []:
            self.loaders.append(_LOADERS[lcfg["type"]](**lcfg.get("args")
                                                       or {}))
        fcfg = cfg.get("formatter")
        self.formatter = (_FORMATTERS[fcfg["type"]](**fcfg.get("args") or {})
                          if fcfg else None)
        # cache_decoded: memoize post-loader elements (decoded images) in
        # host RAM, and let formatters memoize deterministic derived
        # tensors (e.g. the bicubic resize) back into the element. On a
        # TPU pod the host CPU is weak relative to the chip; for small /
        # repeating datasets re-decoding per epoch starves the device
        # pipeline. Opt-in: costs one decoded copy of the dataset in RAM.
        # Random draws (flips, masks, crops) stay per-access, so sample
        # diversity and seeded determinism are unchanged.
        self._cache: Optional[Dict[int, Dict[str, Any]]] = (
            {} if cfg.get("cache_decoded") else None)

    def init_load_info(self, cfg):
        raise NotImplementedError

    # formatters accept an explicit per-item RNG (DataLoader seed mode):
    # mask synthesis / flips / crops become deterministic under any
    # worker count instead of racing on the global np.random stream
    supports_rng = True

    def __len__(self):
        return len(self.load_info)

    def __getitem__(self, idx, rng=None):
        if self._cache is not None:
            element = self._cache.get(idx)
            if element is None:
                element = dict(self.load_info[idx])
                for loader in self.loaders:
                    loader(element)
                element["_cache_derived"] = True
                # dict set is atomic under the GIL; a racing worker at
                # worst decodes the same item twice
                self._cache[idx] = element
        else:
            element = dict(self.load_info[idx])
            for loader in self.loaders:
                loader(element)
        if self.formatter is not None:
            if rng is not None:
                return self.formatter(element, rng=rng)
            return self.formatter(element)
        return element


def collate(items: Sequence[Any]):
    """Stack a list of per-item tuples into batched numpy arrays; list-typed
    and string fields are concatenated into lists
    (reference ds_base.py:95-129)."""
    if not items:
        return items
    first = items[0]
    if isinstance(first, tuple):
        return tuple(collate([it[i] for it in items])
                     for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(items)
    if isinstance(first, (int, float)):
        return np.asarray(items)
    if isinstance(first, list):
        out = []
        for it in items:
            out.extend(it)
        return out
    return list(items)
