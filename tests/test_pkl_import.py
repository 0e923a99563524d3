"""Reference network-snapshot-*.pkl import, without reference code on path.

The reference checkpoints whole torch modules via plain pickle
(reference: lib/experiments/migan_default.py:538-551). These tests build
a real snapshot from the reference's own classes (tiny config), then
load it through migan_tpu.io.pkl_import — which must NOT need the
reference importable — and check exact state_dict recovery plus forward
parity of the imported G_ema through our training net.
"""

import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from lib.model_zoo.migan import (
            Encoder, Synthesis, Generator, Discriminator,
        )
    except Exception:
        pytest.skip("reference repo not available")
    torch.manual_seed(0)
    kw = dict(resolution=64, depthwise=True, reparametrize=True,
              num_reparam_tensors=4)
    g = Generator(Encoder(ic_n=4, **kw), Synthesis(rgb_n=3, **kw))
    d = Discriminator(ic_n=4, **kw)
    g_ema = Generator(Encoder(ic_n=4, **kw), Synthesis(rgb_n=3, **kw))
    with torch.no_grad():
        for p in g_ema.parameters():
            p.add_(torch.randn_like(p) * 0.01)
    path = tmp_path_factory.mktemp("snap") / "network-snapshot-000042.pkl"
    data = {"G": g.eval().requires_grad_(False).cpu(),
            "D": d.eval().requires_grad_(False).cpu(),
            "G_ema": g_ema.eval().requires_grad_(False).cpu()}
    with open(path, "wb") as f:
        pickle.dump(data, f)
    expected = {name: {k: v.detach().numpy()
                       for k, v in mod.state_dict().items()}
                for name, mod in data.items()}
    return str(path), expected


def _unimport_reference():
    """Loader must work with no reference modules importable: drop them."""
    saved = {}
    for name in list(sys.modules):
        if name == "lib" or name.startswith(("lib.", "torch_utils",
                                             "dnnlib")):
            saved[name] = sys.modules.pop(name)
    path_had_ref = REF in sys.path
    if path_had_ref:
        sys.path.remove(REF)
    return saved, path_had_ref


def _reimport_reference(saved, path_had_ref):
    sys.modules.update(saved)
    if path_had_ref:
        sys.path.insert(0, REF)


def test_snapshot_state_dicts_exact(snapshot):
    path, expected = snapshot
    from migan_tpu.io import load_reference_snapshot

    saved, had = _unimport_reference()
    try:
        loaded = load_reference_snapshot(path)
    finally:
        _reimport_reference(saved, had)

    assert set(loaded) == {"G", "D", "G_ema"}
    for name, exp_sd in expected.items():
        got = loaded[name]
        # our walker skips non-tensor entries; the reference nets have none
        # beyond what state_dict() reports, so the key sets must match
        assert set(got) == set(exp_sd), name
        for k in exp_sd:
            np.testing.assert_array_equal(got[k], exp_sd[k],
                                          err_msg=f"{name}.{k}")


def test_snapshot_g_ema_forward_parity(snapshot):
    """pkl -> import_migan_train -> our generator matches the torch module."""
    path, _ = snapshot
    import torch
    import jax.numpy as jnp

    from migan_tpu.io import load_reference_snapshot, import_migan_train
    from migan_tpu.models.migan import MiganConfig, generator_apply

    from lib.model_zoo.migan import Encoder, Synthesis, Generator

    loaded = load_reference_snapshot(path)
    params = import_migan_train(loaded["G_ema"])
    cfg = MiganConfig(resolution=64, depthwise=True, reparametrize=True,
                      num_reparam_tensors=4)

    kw = dict(resolution=64, depthwise=True, reparametrize=True,
              num_reparam_tensors=4)
    ref = Generator(Encoder(ic_n=4, **kw), Synthesis(rgb_n=3, **kw)).eval()
    ref.load_state_dict({k: torch.from_numpy(v)
                         for k, v in loaded["G_ema"].items()})

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), noise_mode="const").numpy()
    got = np.asarray(generator_apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg,
        noise_mode="const")).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_persistence_format_pkl():
    """Older published .pkl models wrap classes with the StyleGAN-ADA
    persistence decorator (reference torch_utils/persistence.py:118-124);
    their _reconstruct_persistent_obj hook must be intercepted and the
    embedded state applied WITHOUT executing the embedded module source."""
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from torch_utils import persistence
    except Exception:
        pytest.skip("reference repo not available")
    from migan_tpu.io import loads_reference_snapshot

    class Tiny(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 8, 3)
            self.register_buffer("buf", torch.arange(4.0))

    # the decorator requires a module-level symbol (persistence.py:107)
    globals()["Tiny"] = Tiny
    try:
        m = persistence.persistent_class(Tiny)().eval().requires_grad_(False)
    finally:
        del globals()["Tiny"]
    blob = pickle.dumps({"G": None, "D": None, "G_ema": m})
    expected = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    saved, had = _unimport_reference()
    try:
        loaded = loads_reference_snapshot(blob)
    finally:
        _reimport_reference(saved, had)

    got = loaded["G_ema"]
    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k], err_msg=k)


def test_bare_module_and_none_entries(snapshot, tmp_path):
    """A pickle of a single module loads under 'G'; None entries pass
    through (the reference stores None for absent nets,
    migan_default.py:534-536)."""
    path, expected = snapshot
    import torch
    from migan_tpu.io import load_reference_snapshot, loads_reference_snapshot

    with open(path, "rb") as f:
        raw = pickle.load(f)

    bare = tmp_path / "bare.pkl"
    with open(bare, "wb") as f:
        pickle.dump(raw["D"], f)
    none_blob = pickle.dumps({"G": raw["G"], "D": None, "G_ema": None})
    saved, had = _unimport_reference()
    try:
        got = load_reference_snapshot(str(bare))
        none_snap = loads_reference_snapshot(none_blob)
    finally:
        _reimport_reference(saved, had)

    assert set(got) == {"G"}
    assert set(got["G"]) == set(expected["D"])
    assert none_snap["D"] is None and none_snap["G_ema"] is None
    assert set(none_snap["G"]) == set(expected["G"])
