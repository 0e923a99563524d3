"""FFHQ dataset variants: JSON-manifest dir, simple dir tree, and zip.

Re-implements reference lib/data_factory/ds_ffhq.py:21-67,233-340 in numpy
NHWC without pyspng/torch (PIL decodes PNGs; per-instance zip handle kept
open like the reference's per-worker handle, ds_ffhq.py:315-336).
"""

from __future__ import annotations

import io
import json
import os
import os.path as osp
from zipfile import ZipFile

import numpy as np
import PIL.Image

from .factory import regdataset, regloader, regformat, ds_base
from .masks import RandomMask

PIL.Image.MAX_IMAGE_PIXELS = None


@regdataset()
class ffhq(ds_base):
    """ffhq-dataset-v2.json manifest variant (reference ds_ffhq.py:21-67)."""

    def init_load_info(self, cfg):
        root_dir = cfg["root_dir"]
        mode = cfg["mode"]
        allow_partial = cfg.get("allow_partial", False)
        with open(osp.join(root_dir, "ffhq-dataset-v2.json")) as f:
            jinfo = json.load(f)
        subset = ["training" if m == "train" else
                  "validation" if m == "val" else None
                  for m in mode.split("+")]
        self.load_info = []
        for _, ji in jinfo.items():
            if ji["category"] not in subset:
                continue
            impath = osp.join(root_dir, ji["image"]["file_path"])
            if not osp.isfile(impath):
                if allow_partial:
                    continue
                raise ValueError(impath)
            if not impath.endswith((".jpg", ".png")):
                continue
            modetag = ("00_train" if ji["category"] == "training"
                       else "50_val")
            filename = osp.basename(impath)
            uid = f"{modetag}-{osp.splitext(filename)[0]}"
            self.load_info.append({
                "unique_id": uid,
                "filename": filename,
                "image_path": impath,
            })


@regdataset()
class ffhqsimple(ds_base):
    """ffhq256x256/<sub>/<file>.png tree (reference ds_ffhq.py:233-254)."""

    def init_load_info(self, cfg):
        root_dir = cfg["root_dir"]
        if cfg["mode"] != "train256":
            raise ValueError(cfg["mode"])
        imagedir = "ffhq256x256"
        self.load_info = []
        for subi in sorted(os.listdir(osp.join(root_dir, imagedir))):
            subdir = osp.join(root_dir, imagedir, subi)
            for fi in sorted(os.listdir(subdir)):
                if ".png" not in fi:
                    continue
                self.load_info.append({
                    "unique_id": osp.splitext(fi)[0],
                    "filename": fi,
                    "image_path": osp.join(subdir, fi),
                })


@regdataset()
class ffhqzip(ds_base):
    """ffhq{256,512}.zip with the comodgan split: val = first 10k, train =
    [10000, 70000) (reference ds_ffhq.py:274-312)."""

    def init_load_info(self, cfg):
        root_dir = cfg["root_dir"]
        mode = cfg["mode"]
        if mode in ("train256",):
            zipname, split = "ffhq256x256.zip", (10000, 70000)
        elif mode in ("val256",):
            zipname, split = "ffhq256x256.zip", (0, 10000)
        elif mode in ("train512", "train512ori"):
            zipname, split = "ffhq512x512.zip", (10000, 70000)
        elif mode in ("val512", "val512ori"):
            zipname, split = "ffhq512x512.zip", (0, 10000)
        else:
            raise ValueError(mode)
        zippath = osp.join(root_dir, zipname)
        self.load_info = []
        with ZipFile(zippath, "r") as z:
            for fi in z.namelist():
                if ".png" not in fi:
                    continue
                filename = osp.basename(fi)
                self.load_info.append({
                    "unique_id": osp.splitext(filename)[0],
                    "filename": filename,
                    "image_path": fi,
                    "zipfile": zippath,
                })
        self.load_info = sorted(self.load_info, key=lambda x: x["unique_id"])
        self.load_info = self.load_info[split[0]:split[1]]


@regloader()
class ZipLoader:
    """Per-instance zip handle (reference ds_ffhq.py:315-336)."""

    def __init__(self):
        self.zipfile = None
        self.zipfilename = None

    def __call__(self, element):
        if self.zipfilename != element["zipfile"]:
            if self.zipfile is not None:
                self.zipfile.close()
            self.zipfile = ZipFile(element["zipfile"], "r")
            self.zipfilename = element["zipfile"]
        with self.zipfile.open(element["image_path"], "r") as f:
            img = PIL.Image.open(io.BytesIO(f.read())).convert("RGB")
        element["image"] = np.asarray(img, np.float32) / 255.0
        return element


@regformat()
class ImageOnlyFormatter:
    """reference ds_ffhq.py:257-265."""

    def __init__(self, random_flip=False):
        self.random_flip = random_flip

    def __call__(self, element, rng=np.random):
        x = element["image"] * 2 - 1
        if self.random_flip and rng.rand() < 0.5:
            x = x[:, ::-1].copy()
        return x.astype(np.float32), element["unique_id"]


@regformat()
class RandomMaskFormatter:
    """Image at native res + RandomMask (reference ds_ffhq.py:340+).

    mask_backend 'native' uses the C++ rasterizer (data/fast_masks.py,
    PIL fallback); 'pil' (default) is the reference's bit-exact generator.
    """

    def __init__(self, random_flip=False, hole_range=(0, 1),
                 mask_backend="pil"):
        self.random_flip = random_flip
        self.hole_range = tuple(hole_range)
        self.mask_backend = mask_backend

    def __call__(self, element, rng=np.random):
        x = element["image"] * 2 - 1
        if self.random_flip and rng.rand() < 0.5:
            x = x[:, ::-1].copy()
        if self.mask_backend == "native":
            from .fast_masks import fast_random_mask

            mask = fast_random_mask(x.shape[0], self.hole_range, rng=rng)
        else:
            mask = RandomMask(x.shape[0], self.hole_range, rng=rng)
        return x.astype(np.float32), mask, element["unique_id"]
