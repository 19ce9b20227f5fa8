"""FLAGSHIP checkpoint import: convert a full Dedark-YOLOv8-L (lowlight_recovery
+ backbone/FPN + 3x AsffTribeLevel + Detect) torch state_dict and assert
forward parity against a torch execution of the same graph.

The torch twin below mirrors the reference module/attr layout exactly
(reference yolov8.yaml:15-52 rows; add_conv block.py:24-45; AsffTribeLevel
block.py:48-115; ExtractParameters2 common.py:52-78; lowlight_recovery
llie.py:11-54; filters filtersB.py) so the converted keys are the real
checkpoint keys. It is a test fixture built from the documented formulas, not
framework code. One conscious deviation carried from nn/enhance.py: the
contrast filter uses channel luminance (the reference's rgb2lum indexes NCHW
tensors with NHWC indices, util_filters.py:270-273 — a layout bug we fixed).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from dedark_yolo_tpu.cfg import model_yaml_load
from dedark_yolo_tpu.nn.graph import DetectionModel
from dedark_yolo_tpu.utils.torch_import import (convert_state_dict,
                                                export_state_dict)
from test_torch_import import TConv, TC2f, TSPPF, TDetect

IMGSZ = 256

pytestmark = pytest.mark.slow


# ----------------------------------------------------------- lowlight twin
class TConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv_block = tnn.Sequential(tnn.Conv2d(cin, cout, 3, 2, 1),
                                         tnn.LeakyReLU(0.1))

    def forward(self, x):
        return self.conv_block(x)


class TExtract(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv_layers = tnn.Sequential(
            TConvBlock(3, 16), TConvBlock(16, 32), TConvBlock(32, 32),
            TConvBlock(32, 32), TConvBlock(32, 32))
        self.fc1 = tnn.Linear(2048, 64)
        self.fc2 = tnn.Linear(64, 15)

    def forward(self, x):
        x = self.conv_layers(x).contiguous().view(-1, 2048)
        return self.fc2(F.leaky_relu(self.fc1(x), 0.1))


def t_tanh_range(x, lo, hi):
    return torch.tanh(x) * (hi - lo) / 2 + (hi + lo) / 2


class TLowlight(tnn.Module):
    """Reference lowlight_recovery with default priors A=0.8, IcA=0.5."""

    def __init__(self):
        super().__init__()
        self.extractor = TExtract()
        k = np.exp(-0.5 * np.square(np.arange(-12, 13, dtype=np.float64) / 5.0))
        k = k / k.sum()
        k2d = np.outer(k, k).astype(np.float32)
        self.register_buffer("gk", torch.from_numpy(k2d)[None, None])

    def forward(self, x):
        feats = self.extractor(F.interpolate(x, (256, 256), mode="bilinear",
                                             align_corners=False))
        b = x.shape[0]
        # DeDark (filtersB.py:189-216), defaults A=0.8, IcA=0.5
        w = t_tanh_range(feats[:, 0:1], 0.1, 1.0)[:, :, None, None]
        tx = torch.clamp(1.0 - w * 0.5, min=0.01)
        x = (x - 0.8) / tx + 0.8
        # WhiteBalance (filtersB.py:246-259), R frozen by mask [0,1,1]
        f = feats[:, 1:4] * torch.tensor([0.0, 1.0, 1.0])
        s = torch.exp(t_tanh_range(f, -0.5, 0.5))
        s = s / (1e-5 + 0.27 * s[:, 0:1] + 0.67 * s[:, 1:2] + 0.06 * s[:, 2:3])
        x = x * s[:, :, None, None]
        # Gamma (filtersB.py:227-233)
        g = torch.exp(t_tanh_range(feats[:, 4:5], -math.log(3), math.log(3)))
        x = torch.clamp(x, min=1e-4) ** g[:, :, None, None]
        # Contrast (filtersB.py:296-303) with channel luminance (see module doc)
        p = torch.tanh(feats[:, 13:14])[:, :, None, None]
        lum = torch.clamp(0.27 * x[:, 0:1] + 0.67 * x[:, 1:2] + 0.06 * x[:, 2:3],
                          0.0, 1.0)
        clum = -torch.cos(math.pi * lum) * 0.5 + 0.5
        x = (1 - p) * x + p * (x / (lum + 1e-6) * clum)
        # USM (filtersB.py:154-175): 25x25 sigma=5 gaussian, reflect pad
        su = t_tanh_range(feats[:, 14:15], 0.0, 5.0)[:, :, None, None]
        xp = F.pad(x, (12, 12, 12, 12), mode="reflect")
        blur = F.conv2d(xp, self.gk.expand(3, 1, 25, 25), groups=3)
        return (x - blur) * su + x


# --------------------------------------------------------------- Asff twin
def t_add_conv(cin, cout, k, s):
    """Reference add_conv (block.py:24-45): conv + batch_norm + leaky."""
    stage = tnn.Sequential()
    stage.add_module("conv", tnn.Conv2d(cin, cout, k, s, (k - 1) // 2,
                                        bias=False))
    stage.add_module("batch_norm", tnn.BatchNorm2d(cout, eps=1e-3,
                                                   momentum=0.03))
    stage.add_module("leaky", tnn.LeakyReLU(0.1))
    return stage


class TAsffTribe(tnn.Module):
    def __init__(self, level):
        super().__init__()
        self.level = level
        dim = [512, 512, 256]
        inter = dim[level]
        if level == 0:
            self.stride_level_1 = tnn.MaxPool2d(2, 2)
            self.stride_level_2 = t_add_conv(256, inter, 3, 2)
            self.expand = t_add_conv(inter, 512, 3, 1)
        elif level == 1:
            self.stride_level_2 = t_add_conv(256, inter, 3, 2)
            self.expand = t_add_conv(inter, 512, 3, 1)
        else:
            self.compress_level_0 = t_add_conv(512, inter, 1, 1)
            self.compress_level_1 = t_add_conv(512, inter, 1, 1)
            self.expand = t_add_conv(inter, 256, 3, 1)
        cc = 8
        self.weight_level_0 = t_add_conv(inter, cc, 1, 1)
        self.weight_level_1 = t_add_conv(inter, cc, 1, 1)
        self.weight_level_2 = t_add_conv(inter, cc, 1, 1)
        self.weight_levels = tnn.Conv2d(cc * 3, 3, 1, 1, 0)

    def forward(self, x):
        if self.level == 0:
            r0 = x[0]
            r1 = self.stride_level_1(x[1])
            r2 = self.stride_level_2(F.max_pool2d(x[2], 3, stride=2, padding=1))
        elif self.level == 1:
            r0 = F.interpolate(x[0], scale_factor=2, mode="nearest")
            r1 = x[1]
            r2 = self.stride_level_2(x[2])
        else:
            r0 = F.interpolate(self.compress_level_0(x[0]), scale_factor=4,
                               mode="nearest")
            r1 = F.interpolate(self.compress_level_1(x[1]), scale_factor=2,
                               mode="nearest")
            r2 = x[2]
        w = torch.cat([self.weight_level_0(r0), self.weight_level_1(r1),
                       self.weight_level_2(r2)], 1)
        w = F.softmax(self.weight_levels(w), dim=1)
        fused = r0 * w[:, 0:1] + r1 * w[:, 1:2] + r2 * w[:, 2:]
        return self.expand(fused)


class TConcat(tnn.Module):
    def forward(self, xs):
        return torch.cat(xs, 1)


class TFlagship(tnn.Module):
    """yolov8.yaml rows 0-26 at L scale with the reference attr layout."""

    def __init__(self, nc=80):
        super().__init__()
        self.model = tnn.Sequential(
            TLowlight(),                       # 0
            TConv(3, 64, 3, 2),                # 1
            TConv(64, 128, 3, 2),              # 2
            TC2f(128, 128, 3, True),           # 3
            TConv(128, 256, 3, 2),             # 4
            TC2f(256, 256, 6, True),           # 5
            TConv(256, 512, 3, 2),             # 6
            TC2f(512, 512, 6, True),           # 7
            TConv(512, 512, 3, 2),             # 8  (1024 capped to 512 at L)
            TC2f(512, 512, 3, True),           # 9
            TSPPF(512, 512, 5),                # 10
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 11
            TConcat(),                         # 12
            TC2f(1024, 512, 3, False),         # 13
            tnn.Upsample(scale_factor=2, mode="nearest"),   # 14
            TConcat(),                         # 15
            TC2f(768, 256, 3, False),          # 16
            TConv(256, 256, 3, 2),             # 17
            TConcat(),                         # 18
            TC2f(768, 512, 3, False),          # 19
            TConv(512, 512, 3, 2),             # 20
            TConcat(),                         # 21
            TC2f(1024, 512, 3, False),         # 22
            TAsffTribe(0),                     # 23
            TAsffTribe(1),                     # 24
            TAsffTribe(2),                     # 25
            TDetect(nc, (256, 512, 512)),      # 26
        )

    def forward(self, x):
        m = self.model
        saved = {}
        x = m[0](x)
        for i in range(1, 11):
            x = m[i](x)
            if i in (5, 7, 10):
                saved[i] = x
        x = m[12]([m[11](x), saved[7]])
        x13 = m[13](x)
        x = m[15]([m[14](x13), saved[5]])
        x16 = m[16](x)
        x = m[18]([m[17](x16), x13])
        x19 = m[19](x)
        x = m[21]([m[20](x19), saved[10]])
        x22 = m[22](x)
        a23 = m[23]([x22, x19, x16])
        a24 = m[24]([x22, x19, x16])
        a25 = m[25]([x22, x19, x16])
        return m[26]([a25, a24, a23])


@pytest.fixture(scope="module")
def flagship_pair():
    torch.manual_seed(0)
    tm = TFlagship().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k and not k.endswith(".gk")}
    d = model_yaml_load("yolov8l.yaml")
    model = DetectionModel(d)
    example = jax.eval_shape(
        model.module.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, IMGSZ, IMGSZ, 3), np.float32))
    variables = convert_state_dict(sd, model, example)
    return tm, model, variables, sd


def test_flagship_convert_covers_all_leaves(flagship_pair):
    """Every torch weight/bias maps; no NotImplementedError on the flagship."""
    tm, model, variables, sd = flagship_pair
    n_flax = len(jax.tree_util.tree_leaves(variables["params"]))
    n_torch_w = len([k for k in sd if k.endswith((".weight", ".bias"))
                     and "running" not in k])
    assert n_flax == n_torch_w
    n_flax_bs = len(jax.tree_util.tree_leaves(variables["batch_stats"]))
    n_torch_bs = len([k for k in sd if "running" in k])
    assert n_flax_bs == n_torch_bs


def test_flagship_forward_parity(flagship_pair):
    """Converted flagship matches the torch execution on the raw head maps."""
    tm, model, variables, sd = flagship_pair
    rng = np.random.default_rng(7)
    x = rng.uniform(0.05, 0.95, (1, IMGSZ, IMGSZ, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fwd = jax.jit(lambda v, img: model.module.apply(v, img, train=False))
    raw = fwd({"params": variables["params"],
               "batch_stats": variables["batch_stats"]}, jnp.asarray(x))
    assert len(raw) == len(t_out) == 3
    for t, j in zip(t_out, raw):
        t_np = t.numpy().transpose(0, 2, 3, 1)
        j_np = np.asarray(j)
        assert j_np.shape == t_np.shape
        # deep L-scale graph: tolerate f32 accumulation differences
        np.testing.assert_allclose(j_np, t_np, rtol=1e-2, atol=2e-3)


def test_flagship_round_trip(flagship_pair):
    tm, model, variables, sd = flagship_pair
    sd2 = export_state_dict(variables, model)
    assert set(sd2) == set(sd)
    for k, v in sd2.items():
        np.testing.assert_allclose(v, sd[k], rtol=1e-6, atol=1e-7, err_msg=k)
