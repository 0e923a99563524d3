"""Data factory: datasets, formatters, samplers, threaded loader."""

import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from migan_tpu.data.factory import get_dataset, collate
from migan_tpu.data.sampler import ShardSampler, InfiniteSampler, DataLoader


@pytest.fixture(scope="module")
def places2_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("places2")
    d = root / "train_256" / "a"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray(
            rng.randint(0, 255, (300, 280, 3), np.uint8)).save(
            d / f"img{i}.jpg")
    return str(root)


def _places_cfg(root, formatter="FreeFormMaskFormatter", res=64):
    return {
        "type": "places2",
        "root_dir": root,
        "mode": "train256",
        "loader": [{"type": "DefaultLoader", "args": {}}],
        "formatter": {"type": formatter,
                      "args": {"resolution": res, "random_flip": True,
                               "hole_range": [0.0, 1.0]}},
    }


def test_places2_freeform(places2_dir):
    ds = get_dataset(_places_cfg(places2_dir))
    assert len(ds) == 6
    x, mask, uid = ds[0]
    assert x.shape == (64, 64, 3) and x.dtype == np.float32
    # bicubic resize overshoots slightly; the reference doesn't clamp either
    assert -1.6 <= x.min() and x.max() <= 1.6
    assert mask.shape == (64, 64) and set(np.unique(mask)) <= {0.0, 1.0}
    assert isinstance(uid, str) and uid.startswith("train256")


def test_places2_freeform_native_mask_backend(places2_dir):
    """mask_backend='native' routes through the C++ rasterizer
    (data/fast_masks.py; silent PIL fallback without a toolchain) and is
    deterministic under a seeded global RNG."""
    cfg = _places_cfg(places2_dir)
    cfg["formatter"]["args"]["mask_backend"] = "native"
    ds = get_dataset(cfg)
    np.random.seed(123)
    x, mask, uid = ds[0]
    assert mask.shape == (64, 64) and set(np.unique(mask)) <= {0.0, 1.0}
    assert (mask == 0).any() and (mask == 1).any()
    np.random.seed(123)
    _, mask2, _ = ds[0]
    np.testing.assert_array_equal(mask, mask2)


def test_ffhqzip(tmp_path):
    zpath = tmp_path / "ffhq256x256.zip"
    rng = np.random.RandomState(1)
    with zipfile.ZipFile(zpath, "w") as z:
        for i in range(12):
            img = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
            import io

            buf = io.BytesIO()
            img.save(buf, format="PNG")
            z.writestr(f"{i:05d}.png", buf.getvalue())
    cfg = {
        "type": "ffhqzip",
        "root_dir": str(tmp_path),
        "mode": "val256",
        "loader": [{"type": "ZipLoader", "args": {}}],
        "formatter": {"type": "ImageOnlyFormatter", "args": {}},
    }
    ds = get_dataset(cfg)
    assert len(ds) == 12  # val split = first 10k (all 12 here)
    x, uid = ds[3]
    assert x.shape == (64, 64, 3)
    assert uid == "00003"


def test_shard_sampler_covers_and_strides():
    s0 = ShardSampler(10, num_shards=2, shard=0, seed=3, extend=True)
    s1 = ShardSampler(10, num_shards=2, shard=1, seed=3, extend=True)
    i0, i1 = s0.epoch_indices(0), s1.epoch_indices(0)
    assert len(i0) == len(i1) == 5
    assert set(i0) | set(i1) == set(range(10))
    # same seed on "another host" gives identical order — no broadcast needed
    i0b = ShardSampler(10, 2, 0, seed=3, extend=True).epoch_indices(0)
    np.testing.assert_array_equal(i0, i0b)


def test_dataloader_threads(places2_dir):
    ds = get_dataset(_places_cfg(places2_dir))
    dl = DataLoader(ds, batch_size=2, num_workers=3, drop_last=True)
    batches = list(dl)
    assert len(batches) == 3
    x, mask, uids = batches[0]
    assert x.shape == (2, 64, 64, 3) and mask.shape == (2, 64, 64)
    assert len(uids) == 2


class _SlowDataset:
    """Items take staggered time so multi-worker completion is out of order
    unless the loader reorders."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import time

        time.sleep(0.002 * ((i * 7) % 5))
        return (np.array([i]), f"u{i}")


def test_dataloader_deterministic_order():
    """Two runs with the same inputs yield identical batch streams, equal to
    the single-worker stream (sequence-numbered reorder buffer)."""
    ds = _SlowDataset(40)

    def stream(workers):
        dl = DataLoader(ds, batch_size=4, num_workers=workers,
                        drop_last=True)
        return [tuple(b[1]) for b in dl]

    s_par_1 = stream(4)
    s_par_2 = stream(4)
    s_seq = stream(1)
    assert s_par_1 == s_par_2 == s_seq
    assert len(s_seq) == 10


def test_dataloader_seeded_rng_bitwise_reproducible(places2_dir):
    """With seed=, mask/flip RNG is per-item (derived from (seed, item
    position)) so two num_workers=4 runs — and a num_workers=1 run — give
    BIT-identical streams (VERDICT r3: the global-np.random default only
    holds at num_workers=1; the reference's torch DataLoader per-worker
    seeding was deterministic only per worker count,
    reference migan_default.py:271-295)."""
    ds = get_dataset(_places_cfg(places2_dir))

    def stream(workers, seed=7):
        np.random.seed(1234 + workers)  # global stream must be irrelevant
        dl = DataLoader(ds, batch_size=2, num_workers=workers,
                        drop_last=True, seed=seed)
        out = []
        for x, mask, uids in dl:
            out.append((x.copy(), mask.copy(), tuple(uids)))
        return out

    a = stream(4)
    b = stream(4)
    c = stream(1)
    for (xa, ma, ua), (xb, mb, ub), (xc, mc, uc) in zip(a, b, c):
        assert ua == ub == uc
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(ma, mc)
        np.testing.assert_array_equal(xa, xb)   # random flips too
        np.testing.assert_array_equal(xa, xc)
    # different seed -> different masks (the rng is actually consumed)
    d = stream(4, seed=8)
    assert any(not np.array_equal(ma, md)
               for (_, ma, _), (_, md, _) in zip(a, d))


def test_cache_decoded_bitwise_equal_and_fresh_draws(places2_dir):
    """cache_decoded memoizes decode+resize in host RAM (the TPU-pod host
    is weak relative to the chip; small datasets starve the device
    pipeline on re-decode). It must change NOTHING numerically: identical
    per-item streams vs the uncached dataset under the same seed, while
    flips/masks still vary access-to-access (randomness is per-access,
    not cached)."""
    from migan_tpu.data.sampler import _item_rng as derive_item_rng

    cfg_plain = _places_cfg(places2_dir)
    cfg_cached = _places_cfg(places2_dir)
    cfg_cached["cache_decoded"] = True
    ds_a, ds_b = get_dataset(cfg_plain), get_dataset(cfg_cached)

    for pos in range(12):          # two passes over 6 items
        idx = pos % 6
        xa, ma, ua = ds_a.__getitem__(idx, rng=derive_item_rng(5, pos))
        xb, mb, ub = ds_b.__getitem__(idx, rng=derive_item_rng(5, pos))
        assert ua == ub
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ma, mb)

    # cached element holds decode + derived resize after first access
    el = ds_b._cache[0]
    assert "image" in el and "_resized_64" in el
    resized_before = el["_resized_64"].copy()

    # randomness still per-access: same item, different rng -> new mask
    _, m1, _ = ds_b.__getitem__(0, rng=derive_item_rng(5, 100))
    _, m2, _ = ds_b.__getitem__(0, rng=derive_item_rng(5, 101))
    assert not np.array_equal(m1, m2)
    # and accesses never mutate the cached buffer
    np.testing.assert_array_equal(ds_b._cache[0]["_resized_64"],
                                  resized_before)


def test_dataloader_seed_requires_rng_support():
    with pytest.raises(ValueError):
        DataLoader(_SlowDataset(8), batch_size=2, seed=3)


def test_infinite_sampler():
    it = iter(InfiniteSampler(4, seed=0))
    seen = [next(it) for _ in range(10)]
    assert set(seen[:4]) == set(range(4))


def test_collate_strings_and_arrays():
    items = [(np.ones((2, 2)), "a"), (np.zeros((2, 2)), "b")]
    x, s = collate(items)
    assert x.shape == (2, 2, 2) and s == ["a", "b"]


def test_adv_inpainting_formatter_matches_torch_bicubic():
    """AdvInpaintingFormatter parity vs the reference's torch bicubic
    resize (reference ds_places2.py:155-179): same global-RNG draw
    sequence (nh, nw, ch, cw, then RandomMask), and cv2 INTER_CUBIC vs
    torch `interpolate(mode='bicubic', align_corners=False)` agree to
    ~1e-4 (both Keys a=-0.75, half-pixel centers) — tolerance-banded
    here since they are not bit-identical."""
    torch = pytest.importorskip("torch")
    from migan_tpu.data.ds_places2 import AdvInpaintingFormatter
    from migan_tpu.data.masks import RandomMask

    rng = np.random.RandomState(3)
    img = rng.rand(300, 400, 3).astype(np.float32)
    fmt = AdvInpaintingFormatter(resolution=256)

    for seed in (0, 1):
        np.random.seed(seed)
        x_ours, mask_ours, uid = fmt({"image": img, "unique_id": "u0"})

        # Oracle: the reference's exact tensor math on the same RNG stream.
        np.random.seed(seed)
        x = (img - 0.5) * 2
        oh, ow = x.shape[:2]
        s = 256
        nh = np.random.randint(s, max(oh, int(s * 1.2)) + 1)
        nw = np.random.randint(s, max(ow, int(s * 1.2)) + 1)
        ch = np.random.randint(0, nh - s + 1)
        cw = np.random.randint(0, nw - s + 1)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(2, 0, 1)).unsqueeze(0),
            size=[nh, nw], mode="bicubic", align_corners=False)
        x_ref = t.squeeze(0).numpy().transpose(1, 2, 0)[ch:ch + s, cw:cw + s]
        mask_ref = RandomMask(s, (0, 1))

        assert uid == "u0"
        assert x_ours.shape == (256, 256, 3)
        assert np.max(np.abs(x_ours - x_ref)) < 1e-3
        np.testing.assert_array_equal(np.asarray(mask_ours),
                                      np.asarray(mask_ref))


def test_dataloader_sharded_positions_match_global_stream(places2_dir):
    """Rank-sharded loaders (start_position=shard, position_stride=n)
    draw per-item RNG from interleaved GLOBAL positions: no two shards
    share a mask/flip stream (the round-4 review found all shards
    colliding on shard-local positions), and the union of the shards'
    items is bit-identical to the single-process stream at the same
    global positions."""
    ds = get_dataset(_places_cfg(places2_dir))
    n = len(ds)  # 6

    glob_dl = DataLoader(ds, batch_size=1, indices=list(range(n)),
                         num_workers=1, drop_last=False, seed=11)
    glob_items = list(glob_dl)

    shard_items = {}
    for p in range(2):
        dl = DataLoader(ds, batch_size=1, indices=list(range(n))[p::2],
                        num_workers=2, drop_last=False, seed=11,
                        start_position=p, position_stride=2)
        for t, it in enumerate(dl):
            shard_items[t * 2 + p] = it

    assert len(shard_items) == n
    for pos, (x, m, u) in shard_items.items():
        xg, mg, ug = glob_items[pos]
        assert tuple(u) == tuple(ug)
        np.testing.assert_array_equal(m, mg)
        np.testing.assert_array_equal(x, xg)

    # and the two shards' streams are actually distinct
    assert not np.array_equal(shard_items[0][1], shard_items[1][1])
