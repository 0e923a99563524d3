"""Torch-side detector oracles for importer/numerics parity tests.

Neither `pytorch_fid` nor `lpips` (nor torchvision) is installed in this
container, so these re-implement — in plain PyTorch, independently of the
JAX code under test — the exact architectures those packages define:

  - ``TorchFIDInception``: pytorch_fid's InceptionV3 wrapper (the detector
    the reference builds at scripts/evaluate_fid_lpips.py:216-218):
    torchvision InceptionV3 topology with the FID-flavor deviations
    (InceptionA/C/E_1 avg-pool branches use count_include_pad=False;
    Mixed_7c uses a 3x3 stride-1 max-pool branch), BasicConv2d = conv(no
    bias) + BatchNorm(eps=1e-3) + relu, 299 bilinear resize
    (align_corners=False) + [0,1]->[-1,1] normalize, 2048-d pool output.
    state_dict() keys match torchvision naming (Mixed_5b.branch1x1.conv.*),
    which is what evalx.inception.import_inception_state_dict consumes.

  - ``TorchLPIPSAlex``: the lpips package's LPIPS(net='alex') graph (the
    metric the reference builds at scripts/evaluate_fid_lpips.py:212-214):
    AlexNet features sliced at the 5 relu taps, ScalingLayer with the
    package's hardcoded shift/scale, per-channel unit-normalization,
    squared diff, 1x1 linear heads, spatial mean, sum. state_dict() keys
    match the package (net.slice1.0.weight, lin0.model.1.weight), which is
    what evalx.lpips.import_lpips_state_dict consumes.

Weights are randomized (seeded) — the tests assert *activation parity*
between torch and the JAX import, which validates the importers and the
JAX architectures; real published weights then slot in with the same code
path.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


def _avgpool3_nopad(x):
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                        count_include_pad=False)


class FIDInceptionA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avgpool3_nopad(x))
        return torch.cat([b1, b5, bd, bp], 1)


class FIDInceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class FIDInceptionC(nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        bp = self.branch_pool(_avgpool3_nopad(x))
        return torch.cat([b1, b7, bd, bp], 1)


class FIDInceptionD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class FIDInceptionE(nn.Module):
    """pool='avg' => FIDInceptionE_1 (Mixed_7b), 'max' => E_2 (Mixed_7c)."""

    def __init__(self, in_ch, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "max":
            bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        else:
            bp = _avgpool3_nopad(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TorchFIDInception(nn.Module):
    """pytorch_fid InceptionV3([3]) equivalent: [N,3,H,W] in [0,1] ->
    [N, 2048] pool features."""

    def __init__(self, resize_input=True, normalize_input=True):
        super().__init__()
        self.resize_input = resize_input
        self.normalize_input = normalize_input
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = FIDInceptionA(192, 32)
        self.Mixed_5c = FIDInceptionA(256, 64)
        self.Mixed_5d = FIDInceptionA(288, 64)
        self.Mixed_6a = FIDInceptionB(288)
        self.Mixed_6b = FIDInceptionC(768, 128)
        self.Mixed_6c = FIDInceptionC(768, 160)
        self.Mixed_6d = FIDInceptionC(768, 160)
        self.Mixed_6e = FIDInceptionC(768, 192)
        self.Mixed_7a = FIDInceptionD(768)
        self.Mixed_7b = FIDInceptionE(1280, pool="avg")
        self.Mixed_7c = FIDInceptionE(2048, pool="max")

    def forward(self, x):
        if self.resize_input:
            x = F.interpolate(x, size=(299, 299), mode="bilinear",
                              align_corners=False)
        if self.normalize_input:
            x = 2 * x - 1
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        x = F.adaptive_avg_pool2d(x, (1, 1))
        return x.flatten(1)


def randomize_inception_(model, seed=0):
    """Random-but-plausible weights incl. nontrivial BN running stats."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
            m.weight.data = torch.randn(m.weight.shape, generator=g) \
                / fan_in ** 0.5
        elif isinstance(m, nn.BatchNorm2d):
            n = m.num_features
            m.weight.data = 0.5 + torch.rand(n, generator=g)
            m.bias.data = 0.1 * torch.randn(n, generator=g)
            m.running_mean.data = 0.1 * torch.randn(n, generator=g)
            m.running_var.data = 0.5 + torch.rand(n, generator=g)
    model.eval()
    return model


# ---------------------------------------------------------------------------
# NVIDIA TorchScript Inception (training-time FID flavor)
# ---------------------------------------------------------------------------


def _tf_module(**children):
    """Bare container registering children under TF tower names."""
    m = nn.Module()
    for name, child in children.items():
        setattr(m, name, child)
    return m


class TorchNVIDIAInception(nn.Module):
    """Stand-in for NVIDIA's inception-2015-12-05.pt TorchScript detector
    (the reference's training-time FID detector,
    lib/evaluator/stylegan_metrics/frechet_inception_distance.py:25-29):
    the TF-2015 inception graph with its original tower naming
    (state_dict keys like 'layers.mixed_4.tower.conv_1.conv.weight'),
    taking raw [0,255] NCHW input, resizing to 299 via the TorchScript's
    affine_grid/grid_sample trick (which reproduces TF1's legacy
    resize_bilinear align_corners=False), then (x-128)/128.

    The backbone math is the same graph pytorch_fid ported (its
    FIDInception* classes), so the blocks reuse this file's FID oracle
    modules re-hung on a TF-named tree; the JAX side under test
    (evalx.inception.inception_apply_nvidia + import_inception_tf_names)
    implements the resize independently (gather+lerp vs grid_sample), so
    parity also cross-checks the TF-legacy resize arithmetic."""

    def __init__(self):
        super().__init__()

        def unit(ic, oc, **kw):
            return BasicConv2d(ic, oc, **kw)

        def block_a(ic, pf):
            return _tf_module(
                conv=unit(ic, 64, kernel_size=1),
                tower=_tf_module(
                    conv=unit(ic, 48, kernel_size=1),
                    conv_1=unit(48, 64, kernel_size=5, padding=2)),
                tower_1=_tf_module(
                    conv=unit(ic, 64, kernel_size=1),
                    conv_1=unit(64, 96, kernel_size=3, padding=1),
                    conv_2=unit(96, 96, kernel_size=3, padding=1)),
                tower_2=_tf_module(conv=unit(ic, pf, kernel_size=1)))

        def block_b(ic):
            return _tf_module(
                conv=unit(ic, 384, kernel_size=3, stride=2),
                tower=_tf_module(
                    conv=unit(ic, 64, kernel_size=1),
                    conv_1=unit(64, 96, kernel_size=3, padding=1),
                    conv_2=unit(96, 96, kernel_size=3, stride=2)))

        def block_c(ic, c7):
            return _tf_module(
                conv=unit(ic, 192, kernel_size=1),
                tower=_tf_module(
                    conv=unit(ic, c7, kernel_size=1),
                    conv_1=unit(c7, c7, kernel_size=(1, 7), padding=(0, 3)),
                    conv_2=unit(c7, 192, kernel_size=(7, 1), padding=(3, 0))),
                tower_1=_tf_module(
                    conv=unit(ic, c7, kernel_size=1),
                    conv_1=unit(c7, c7, kernel_size=(7, 1), padding=(3, 0)),
                    conv_2=unit(c7, c7, kernel_size=(1, 7), padding=(0, 3)),
                    conv_3=unit(c7, c7, kernel_size=(7, 1), padding=(3, 0)),
                    conv_4=unit(c7, 192, kernel_size=(1, 7), padding=(0, 3))),
                tower_2=_tf_module(conv=unit(ic, 192, kernel_size=1)))

        def block_d(ic):
            return _tf_module(
                tower=_tf_module(
                    conv=unit(ic, 192, kernel_size=1),
                    conv_1=unit(192, 320, kernel_size=3, stride=2)),
                tower_1=_tf_module(
                    conv=unit(ic, 192, kernel_size=1),
                    conv_1=unit(192, 192, kernel_size=(1, 7), padding=(0, 3)),
                    conv_2=unit(192, 192, kernel_size=(7, 1), padding=(3, 0)),
                    conv_3=unit(192, 192, kernel_size=3, stride=2)))

        def block_e(ic):
            return _tf_module(
                conv=unit(ic, 320, kernel_size=1),
                tower=_tf_module(
                    conv=unit(ic, 384, kernel_size=1),
                    mixed=_tf_module(
                        conv=unit(384, 384, kernel_size=(1, 3),
                                  padding=(0, 1)),
                        conv_1=unit(384, 384, kernel_size=(3, 1),
                                    padding=(1, 0)))),
                tower_1=_tf_module(
                    conv=unit(ic, 448, kernel_size=1),
                    conv_1=unit(448, 384, kernel_size=3, padding=1),
                    mixed=_tf_module(
                        conv=unit(384, 384, kernel_size=(1, 3),
                                  padding=(0, 1)),
                        conv_1=unit(384, 384, kernel_size=(3, 1),
                                    padding=(1, 0)))),
                tower_2=_tf_module(conv=unit(ic, 192, kernel_size=1)))

        self.layers = _tf_module(
            conv=unit(3, 32, kernel_size=3, stride=2),
            conv_1=unit(32, 32, kernel_size=3),
            conv_2=unit(32, 64, kernel_size=3, padding=1),
            conv_3=unit(64, 80, kernel_size=1),
            conv_4=unit(80, 192, kernel_size=3),
            mixed=block_a(192, 32), mixed_1=block_a(256, 64),
            mixed_2=block_a(288, 64), mixed_3=block_b(288),
            mixed_4=block_c(768, 128), mixed_5=block_c(768, 160),
            mixed_6=block_c(768, 160), mixed_7=block_c(768, 192),
            mixed_8=block_d(768), mixed_9=block_e(1280),
            mixed_10=block_e(2048))
        self.output = nn.Linear(2048, 1008)  # classifier head: FID ignores

    @staticmethod
    def _resize_tf(x, size=299):
        """The TorchScript's resize: affine_grid/grid_sample with
        theta[·,2] += 1/in - 1/out (align_corners=False), which equals
        TF1 legacy resize_bilinear: src = dst * (in/out), clamped."""
        b, c, h, w = x.shape
        theta = torch.eye(2, 3, dtype=x.dtype)
        theta[0, 2] += theta[0, 0] / w - theta[0, 0] / size
        theta[1, 2] += theta[1, 1] / h - theta[1, 1] / size
        theta = theta.unsqueeze(0).repeat(b, 1, 1)
        grid = F.affine_grid(theta, [b, c, size, size], align_corners=False)
        return F.grid_sample(x, grid, mode="bilinear",
                             padding_mode="border", align_corners=False)

    def forward(self, img, return_features=True):
        """img: [N,3,H,W] float (or uint8) in [0,255]."""
        x = img.to(torch.float32)
        x = self._resize_tf(x)
        x = (x - 128.0) / 128.0

        L = self.layers

        def a(b, x):
            return torch.cat([
                b.conv(x),
                b.tower.conv_1(b.tower.conv(x)),
                b.tower_1.conv_2(b.tower_1.conv_1(b.tower_1.conv(x))),
                b.tower_2.conv(_avgpool3_nopad(x))], 1)

        def bblk(b, x):
            return torch.cat([
                b.conv(x),
                b.tower.conv_2(b.tower.conv_1(b.tower.conv(x))),
                F.max_pool2d(x, kernel_size=3, stride=2)], 1)

        def c(b, x):
            t1 = b.tower_1
            bd = t1.conv_4(t1.conv_3(t1.conv_2(t1.conv_1(t1.conv(x)))))
            return torch.cat([
                b.conv(x),
                b.tower.conv_2(b.tower.conv_1(b.tower.conv(x))),
                bd, b.tower_2.conv(_avgpool3_nopad(x))], 1)

        def d(b, x):
            t1 = b.tower_1
            return torch.cat([
                b.tower.conv_1(b.tower.conv(x)),
                t1.conv_3(t1.conv_2(t1.conv_1(t1.conv(x)))),
                F.max_pool2d(x, kernel_size=3, stride=2)], 1)

        def e(b, x, pool):
            t = b.tower.conv(x)
            t = torch.cat([b.tower.mixed.conv(t), b.tower.mixed.conv_1(t)], 1)
            t1 = b.tower_1.conv_1(b.tower_1.conv(x))
            t1 = torch.cat([b.tower_1.mixed.conv(t1),
                            b.tower_1.mixed.conv_1(t1)], 1)
            if pool == "max":
                bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
            else:
                bp = _avgpool3_nopad(x)
            return torch.cat([b.conv(x), t, t1, b.tower_2.conv(bp)], 1)

        x = L.conv(x)
        x = L.conv_1(x)
        x = L.conv_2(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = L.conv_3(x)
        x = L.conv_4(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = a(L.mixed, x)
        x = a(L.mixed_1, x)
        x = a(L.mixed_2, x)
        x = bblk(L.mixed_3, x)
        x = c(L.mixed_4, x)
        x = c(L.mixed_5, x)
        x = c(L.mixed_6, x)
        x = c(L.mixed_7, x)
        x = d(L.mixed_8, x)
        x = e(L.mixed_9, x, pool="avg")
        x = e(L.mixed_10, x, pool="max")
        features = F.avg_pool2d(x, kernel_size=8).flatten(1)  # TF pool_3
        if return_features:
            return features
        return self.output(features)


# ---------------------------------------------------------------------------
# LPIPS (alex)
# ---------------------------------------------------------------------------

class _AlexSlices(nn.Module):
    """torchvision AlexNet.features split at the 5 relu taps, preserving
    the original Sequential indices in each slice (lpips package layout)."""

    def __init__(self):
        super().__init__()
        layers = [
            nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),   # 0
            nn.ReLU(inplace=True),                                   # 1
            nn.MaxPool2d(kernel_size=3, stride=2),                   # 2
            nn.Conv2d(64, 192, kernel_size=5, padding=2),            # 3
            nn.ReLU(inplace=True),                                   # 4
            nn.MaxPool2d(kernel_size=3, stride=2),                   # 5
            nn.Conv2d(192, 384, kernel_size=3, padding=1),           # 6
            nn.ReLU(inplace=True),                                   # 7
            nn.Conv2d(384, 256, kernel_size=3, padding=1),           # 8
            nn.ReLU(inplace=True),                                   # 9
            nn.Conv2d(256, 256, kernel_size=3, padding=1),           # 10
            nn.ReLU(inplace=True),                                   # 11
        ]
        bounds = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]
        for si, (lo, hi) in enumerate(bounds):
            sl = nn.Sequential()
            for idx in range(lo, hi):
                sl.add_module(str(idx), layers[idx])
            setattr(self, f"slice{si + 1}", sl)

    def forward(self, x):
        taps = []
        for si in range(5):
            x = getattr(self, f"slice{si + 1}")(x)
            taps.append(x)
        return taps


class _NetLinLayer(nn.Module):
    def __init__(self, chn):
        super().__init__()
        self.model = nn.Sequential(
            nn.Dropout(), nn.Conv2d(chn, 1, 1, bias=False))

    def forward(self, x):
        return self.model(x)


class TorchLPIPSAlex(nn.Module):
    """lpips.LPIPS(net='alex') equivalent. forward(x0, x1, normalize=True)
    with inputs [N,3,H,W] in [0,1] -> [N] distances."""

    _SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    _SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def __init__(self):
        super().__init__()
        self.net = _AlexSlices()
        for i, chn in enumerate([64, 192, 384, 256, 256]):
            setattr(self, f"lin{i}", _NetLinLayer(chn))

    @staticmethod
    def _unit_normalize(x, eps=1e-10):
        norm = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (norm + eps)

    def forward(self, x0, x1, normalize=True):
        if normalize:
            x0 = 2 * x0 - 1
            x1 = 2 * x1 - 1
        x0 = (x0 - self._SHIFT) / self._SCALE
        x1 = (x1 - self._SHIFT) / self._SCALE
        taps0 = self.net(x0)
        taps1 = self.net(x1)
        total = 0.0
        for i, (t0, t1) in enumerate(zip(taps0, taps1)):
            d = (self._unit_normalize(t0) - self._unit_normalize(t1)) ** 2
            v = getattr(self, f"lin{i}")(d)
            total = total + v.mean(dim=(1, 2, 3))
        return total


# ---------------------------------------------------------------------------
# MIGAN app pipeline (reference scripts/create_onnx_pipeline.py:119-264)
# ---------------------------------------------------------------------------

class TorchPipelineOracle(nn.Module):
    """The reference MIGAN_Pipeline's tensor math, verbatim, with the
    torchvision calls (absent in this image) replaced by their documented
    F.interpolate equivalents:

      tvF.resize(x_u8, s, BILINEAR) == round+clamp of
          F.interpolate(x_f32, s, mode='bilinear', align_corners=False)
          cast back to the input dtype (uint8 path quantizes);
      tvF.resize(x, s, NEAREST)     == F.interpolate(x, s, mode='nearest').

    Takes an already-constructed generator (the reference's
    migan_inference.Generator loaded from the same .pt under test).
    """

    def __init__(self, model, resolution, padding=128):
        super().__init__()
        self.model = model.eval()
        self.res = resolution
        self.padding = padding
        k = cv2_gaussian_kernel_5x1()
        self.register_buffer("blur_w", k)

    @staticmethod
    def _resize_bilinear_u8(x_u8, size):
        y = F.interpolate(x_u8.to(torch.float32), size=size, mode="bilinear",
                          align_corners=False)
        return y.clamp(0, 255).round().to(x_u8.dtype)

    def get_masked_bbox(self, mask):
        # mirror of reference :132-231 with static h/w
        h, w = mask.shape[2], mask.shape[3]
        m = mask.squeeze().to(torch.float32)
        xx = m.mean(dim=0)
        yy = m.mean(dim=1)
        w_idx = torch.arange(w, dtype=torch.int64)
        h_idx = torch.arange(h, dtype=torch.int64)
        xm = w_idx[xx < 255.0]
        ym = h_idx[yy < 255.0]
        x_min = torch.cat([xm, torch.tensor([w])]).min()
        x_max = torch.cat([xm, torch.tensor([0])]).max()
        y_min = torch.cat([ym, torch.tensor([h])]).min()
        y_max = torch.cat([ym, torch.tensor([0])]).max()
        x_min, x_max = torch.minimum(x_min, x_max), torch.maximum(x_min, x_max)
        y_min, y_max = torch.minimum(y_min, y_max), torch.maximum(y_min, y_max)

        cnt_x = (x_min + x_max) // 2
        cnt_y = (y_min + y_max) // 2
        crop = torch.maximum(x_max - x_min, y_max - y_min) + 2 * self.padding
        crop = torch.clamp(crop, min=self.res)
        off = crop // 2
        x_min = (cnt_x - off).clamp(min=0)
        x_max = (cnt_x + off).clamp(max=w)
        y_min = (cnt_y - off).clamp(min=0)
        y_max = (cnt_y + off).clamp(max=h)
        x_ex = (crop - (x_max - x_min)).clamp(min=0)
        y_ex = (crop - (y_max - y_min)).clamp(min=0)
        x_min = (x_min - x_ex).clamp(min=0)
        x_max = (x_max + x_ex).clamp(max=w)
        y_min = (y_min - y_ex).clamp(min=0)
        y_max = (y_max + y_ex).clamp(max=h)
        return x_min, x_max, y_min, y_max

    def _blur(self, x):
        xp = F.pad(x, (2, 2, 2, 2), mode="reflect")
        return F.conv2d(xp, self.blur_w.to(x.dtype))

    def forward(self, image, mask):
        """image [1,3,H,W] uint8, mask [1,1,H,W] uint8 (255=known)."""
        x_min, x_max, y_min, y_max = self.get_masked_bbox(mask)
        img_c = image[:, :, y_min:y_max, x_min:x_max]
        msk_c = mask[:, :, y_min:y_max, x_min:x_max]
        # preprocess (:233-239)
        img_s = self._resize_bilinear_u8(img_c, (self.res, self.res))
        msk_s = F.interpolate(msk_c.to(torch.float32),
                              size=(self.res, self.res), mode="nearest")
        img_n = img_s.to(torch.float32) * 2 / 255 - 1
        msk_n = msk_s / 255
        x = torch.cat([msk_n - 0.5, img_n * msk_n], dim=1)
        with torch.no_grad():
            out = self.model(x)
        # postprocess (:241-250)
        out = ((out * 0.5 + 0.5) * 255).clamp(0, 255)
        out = F.interpolate(out, size=(img_c.size(2), img_c.size(3)),
                            mode="bilinear", align_corners=False)
        m = F.max_pool2d(msk_c.to(torch.float32), 3, stride=1, padding=1)
        m = self._blur(m) / 255
        composed = img_c.to(torch.float32) * m + out * (1 - m)
        composed = composed.clamp(0, 255).to(torch.uint8)
        result = image.clone()
        result[:, :, y_min:y_max, x_min:x_max] = composed
        return result


def cv2_gaussian_kernel_5x1():
    """The reference GaussianSmoothing(k=5, sigma=1) weight, built with the
    reference's own formula exp(-((x-mean)/(2*sigma))**2) — note the 2*sigma
    in the denominator inside the square (create_onnx_pipeline.py:81-87)."""
    import math
    ax = torch.arange(5, dtype=torch.float32) - 2.0
    g = 1 / (1.0 * math.sqrt(2 * math.pi)) * torch.exp(-((ax / 2.0) ** 2))
    k = torch.outer(g, g)
    k = k / k.sum()
    return k.view(1, 1, 5, 5)


def randomize_lpips_(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for name, m in model.named_modules():
        if isinstance(m, nn.Conv2d):
            if name.startswith("lin"):
                m.weight.data = torch.rand(m.weight.shape, generator=g) \
                    / m.in_channels
            else:
                fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
                m.weight.data = torch.randn(m.weight.shape, generator=g) \
                    / fan_in ** 0.5
                m.bias.data = 0.1 * torch.randn(m.bias.shape, generator=g)
    model.eval()
    return model
