"""Torch state_dict converter tests: round-trip bijection + numerical parity
of the converted weights against a torch execution of the same graph.

The torch twin modules here are built from the documented formulas (conv+BN+SiLU
etc.) to cross-check layout/transpose conventions — they are test fixtures, not
framework code."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from dedark_yolo_tpu.nn.graph import DetectionModel
from dedark_yolo_tpu.utils.torch_import import (convert_state_dict,
                                                export_state_dict)

MINI_YAML = {
    "nc": 2,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C2f", [32, True]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "SPPF", [32, 5]],
    ],
    "head": [
        [[2, 4, 5], 1, "Detect", ["nc"]],
    ],
}


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return tnn.functional.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3, 1)
        self.cv2 = TConv(c, c, 3, 1)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, c2, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))


class TDetect(tnn.Module):
    def __init__(self, nc, ch):
        super().__init__()
        c2 = max(16, ch[0] // 4, 64)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(tnn.Sequential(
            TConv(x, c2, 3), TConv(c2, c2, 3), tnn.Conv2d(c2, 64, 1)) for x in ch)
        self.cv3 = tnn.ModuleList(tnn.Sequential(
            TConv(x, c3, 3), TConv(c3, c3, 3), tnn.Conv2d(c3, nc, 1)) for x in ch)

    def forward(self, xs):
        return [torch.cat((a(x), b(x)), 1) for a, b, x in zip(self.cv2, self.cv3, xs)]


class TMini(tnn.Module):
    def __init__(self, nc=2):
        super().__init__()
        self.model = tnn.Sequential(
            TConv(3, 16, 3, 2), TConv(16, 32, 3, 2), TC2f(32, 32, 1, True),
            TConv(32, 32, 3, 2), TConv(32, 32, 3, 2), TSPPF(32, 32, 5),
            TDetect(nc, (32, 32, 32)))

    def forward(self, x):
        feats = []
        for i, m in enumerate(self.model[:-1]):
            x = m(x)
            if i in (2, 4, 5):
                feats.append(x)
        return self.model[-1](feats)


@pytest.fixture(scope="module")
def pair():
    tm = TMini().eval()
    # randomize BN stats so the test is not trivially identity
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    model = DetectionModel(dict(MINI_YAML))
    example = jax.eval_shape(model.module.init, jax.random.PRNGKey(0),
                             jax.ShapeDtypeStruct((1, 64, 64, 3), np.float32))
    variables = convert_state_dict(sd, model, example)
    return tm, model, variables, sd


def test_convert_covers_all_leaves(pair):
    tm, model, variables, sd = pair
    n_flax = len(jax.tree_util.tree_leaves(variables["params"]))
    n_torch_w = len([k for k in sd if k.endswith((".weight", ".bias"))
                     and "running" not in k])
    assert n_flax == n_torch_w


def test_numerical_parity_forward(pair):
    tm, model, variables, sd = pair
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    raw = model.module.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    for t, j in zip(t_out, raw):
        t_np = t.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        np.testing.assert_allclose(np.asarray(j), t_np, rtol=1e-3, atol=1e-4)


def test_round_trip(pair):
    tm, model, variables, sd = pair
    sd2 = export_state_dict(variables, model)
    for k, v in sd2.items():
        np.testing.assert_allclose(v, sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_convtranspose_convention():
    """The importer's ConvTranspose mapping must reproduce torch's op exactly.

    torch.nn.ConvTranspose2d is the GRADIENT of a convolution (kernel applied
    spatially mirrored); flax nn.ConvTranspose (transpose_kernel=False) runs a
    fractionally-strided conv with the kernel unflipped. The documented
    convention — transpose (I,O,kh,kw)->(kh,kw,I,O) THEN reverse both spatial
    axes — is what convert_state_dict/export_state_dict apply for Proto's
    upsample (reference block.py:242-254). Round-trip tests alone cannot catch
    a missing flip (it cancels); this pins the convention against torch."""
    import flax.linen as fnn

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 5, 6, 4)).astype(np.float32)
    wt = rng.normal(size=(4, 3, 2, 2)).astype(np.float32)  # (I, O, kh, kw)
    b = rng.normal(size=(3,)).astype(np.float32)

    tconv = tnn.ConvTranspose2d(4, 3, 2, 2, 0, bias=True)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(wt))
        tconv.bias.copy_(torch.from_numpy(b))
        yt = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    yt = yt.numpy().transpose(0, 2, 3, 1)

    kernel = np.transpose(wt, (2, 3, 0, 1))[::-1, ::-1]  # importer convention
    m = fnn.ConvTranspose(3, (2, 2), strides=(2, 2), use_bias=True)
    with jax.default_matmul_precision("highest"):
        yf = m.apply({"params": {"kernel": jnp.asarray(kernel.copy()),
                                 "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yf), yt, rtol=1e-5, atol=1e-5)
