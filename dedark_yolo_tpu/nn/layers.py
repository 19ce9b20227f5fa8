"""Conv/block zoo as flax.linen modules, NHWC, TPU-first.

Behavioral parity with the reference zoo (ultralytics/nn/modules/conv.py and
block.py) — same compositional structure and math — but designed for XLA:
channel-last layout (channels map to TPU lanes), explicit static padding matching
torch's autopad (k//2), BatchNorm with eps=1e-3 / momentum 0.03 like ultralytics'
initialize_weights (torch_utils.py:257-267), and no Python-level layer interpreter:
everything composes into one traced graph.

Input channels are inferred by flax at init, so modules carry only their
hyperparameters (the reference threads c1 explicitly through parse_model).
"""

from __future__ import annotations

import os as _os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Torch BN defaults per ultralytics initialize_weights: eps=1e-3, momentum=0.03.
BN_MOMENTUM = 0.97  # flax momentum = 1 - torch momentum
BN_EPS = 1e-3


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-style pad for odd kernels. Reference conv.py:15-21."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


def get_act(name):
    return {
        "silu": jax.nn.silu,
        "relu": jax.nn.relu,
        "relu6": jax.nn.relu6,
        "leaky": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
        "identity": lambda x: x,
    }[name]


def max_pool_same(x, k: int, s: int = 1):
    """Torch-style MaxPool2d(k, stride=s, padding=k//2) on NHWC."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)))


def upsample_nearest(x, scale: int = 2):
    """Integer-factor nearest upsample as broadcast+reshape — identical to
    jax.image.resize(nearest) for integer scales but lowers to a copy-free
    broadcast instead of a gather (the FPN top-down stage is HBM-bound)."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, scale, w, scale, c))
    return y.reshape(b, h * scale, w * scale, c)


# Trace-time switch for channel-concat elision (split-K partial dots instead of
# materializing concatenated activations). Parameter trees are identical either
# way, so the same checkpoint works with the flag on or off.
# DEFAULT OFF: chip-timed A/B at b384 @640 bf16 measured the elided graph at
# 524 img/s vs 734 img/s for plain concat+conv — XLA fuses the concat into
# the consuming conv better than the split-K partial-dot formulation maps to
# the MXU (docs/BENCHMARKS.md round-3 A/B). DEDARK_ELIDE_CONCAT=1 re-enables
# for experiments; the HLO-structure tests pin both graph forms.
ELIDE_CONCAT = _os.environ.get("DEDARK_ELIDE_CONCAT", "0").lower() not in (
    "0", "false", "off")


def set_concat_elision(on: bool):
    global ELIDE_CONCAT
    ELIDE_CONCAT = bool(on)


# Same A/B switch for the ASFF weight-branch commute (exact either way; the
# param tree is identical). DEDARK_ASFF_COMMUTE=0 disables it at import time;
# per-module override via the commute_weights field.
ASFF_COMMUTE = _os.environ.get("DEDARK_ASFF_COMMUTE", "1").lower() not in (
    "0", "false", "off")


class LazyUp(object):
    """A nearest-upsample kept UNMATERIALIZED: holds (x, scale).

    The FPN top-down pattern [Upsample -> Concat -> C2f] feeds a 2x-size
    broadcast of P5 into the C2f's 1x1 cv1. Nearest upsample commutes with a
    1x1 conv — conv1x1(up(x)) == up(conv1x1(x)) exactly — so the partial dot
    runs at the LOW resolution (4x fewer MACs on that operand) and only the
    small result is upsampled, fused into the lateral partial's add epilogue.
    The round-3 roofline's 47%-of-peak top-down stage motivates this
    (VERDICT r4 #2); reference pattern: ultralytics/cfg/models/v8/
    yolov8.yaml head rows 1-3 (Upsample/Concat/C2f)."""

    __slots__ = ("x", "scale")

    def __init__(self, x, scale):
        self.x = x
        self.scale = int(scale)

    @property
    def shape(self):
        b, h, w, c = self.x.shape
        return (b, h * self.scale, w * self.scale, c)

    @property
    def dtype(self):
        return self.x.dtype

    def dense(self):
        return upsample_nearest(self.x, self.scale)


# pytree registration so LazyUp survives lifted transforms (nn.remat wraps
# module calls whose inputs may carry one)
jax.tree_util.register_pytree_node(
    LazyUp,
    lambda u: ((u.x,), u.scale),
    lambda scale, xs: LazyUp(xs[0], scale))


class ConcatConv(nn.Module):
    """1x1 stride-1 conv over a *virtual* channel-concat of its inputs.

    XLA materializes `concatenate` feeding a convolution/dot as a real HBM
    buffer (write + re-read); on the flagship graph at batch 256 those concat
    buffers in the backbone C2f blocks and the FPN are several GB of pure
    bandwidth. This module is parameter-compatible with
    nn.Conv(features, (1,1), use_bias=False) — a single 'kernel' of shape
    (1, 1, sum(Cin), features) — but computes sum_i dot(x_i, kernel_i) with
    fp32 accumulation, never forming the concatenated activation. Numerically
    within accumulation rounding of the fused conv (exact contraction order
    differs; partials are accumulated in fp32 like the MXU does internally).
    """
    features: int

    @nn.compact
    def __call__(self, xs):
        cs = [t.shape[-1] for t in xs]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, sum(cs), self.features), jnp.float32)
        # mirror flax promote_dtype: compute in result_type(inputs, kernel)
        dt = jnp.result_type(*([t.dtype for t in xs] + [kernel.dtype]))
        w2d = kernel[0, 0].astype(dt)
        acc = None
        off = 0
        for t, c in zip(xs, cs):
            # LazyUp parts contract at their LOW resolution; only the small
            # partial is upsampled (a copy-free broadcast the add fuses) —
            # conv1x1 and nearest-upsample commute exactly
            src = t.x if isinstance(t, LazyUp) else t
            part = jax.lax.dot_general(
                src.astype(dt), w2d[off:off + c, :],
                (((src.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if isinstance(t, LazyUp):
                part = upsample_nearest(part, t.scale)
            acc = part if acc is None else acc + part
            off += c
        return acc.astype(dt)


class Conv(nn.Module):
    """Conv2d + BN + act. Reference conv.py:38-55."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Any = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        if isinstance(x, (list, tuple)):
            # virtual channel-concat input (see ConcatConv); only a 1x1/s1
            # ungrouped conv can split across K — otherwise materialize.
            # A LazyUp part (FPN top-down fuse) always takes the split path:
            # its win is the low-resolution partial dot, not mere elision.
            has_lazyup = any(isinstance(p, LazyUp) for p in x)
            if ((ELIDE_CONCAT or has_lazyup) and self.k == 1 and self.s == 1
                    and self.g == 1 and self.d == 1 and pad == 0):
                x = ConcatConv(self.c2, name="Conv_0")(list(x))
            else:
                x = jnp.concatenate(
                    [p.dense() if isinstance(p, LazyUp) else p for p in x],
                    axis=-1)
                x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                            padding=((pad, pad), (pad, pad)),
                            feature_group_count=self.g,
                            kernel_dilation=(self.d, self.d), use_bias=False,
                            name="Conv_0")(x)
        else:
            x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                        padding=((pad, pad), (pad, pad)), feature_group_count=self.g,
                        kernel_dilation=(self.d, self.d), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)(x)
        act = self.act if self.act is not True else "silu"
        return get_act(act if isinstance(act, str) else "identity")(x)


class Conv2d(nn.Module):
    """Bare conv (torch nn.Conv2d equivalent), bias configurable."""
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        return nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                       padding=((pad, pad), (pad, pad)), feature_group_count=self.g,
                       kernel_dilation=(self.d, self.d), use_bias=self.bias)(x)


class Conv2(nn.Module):
    """Parallel 3x3 + 1x1 conv sharing one BN (simplified RepConv).
    Reference conv.py:58-76."""
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k)
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((pad, pad), (pad, pad)), feature_group_count=self.g,
                    use_bias=False)(x)
        y = y + nn.Conv(self.c2, (1, 1), strides=(self.s, self.s),
                        feature_group_count=self.g, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)(y)
        act = self.act if self.act is not True else "silu"
        return get_act(act if isinstance(act, str) else "identity")(y)


class FC(nn.Module):
    """MLP head: in -> 1024 -> 256 -> 6 with ReLU (reference conv.py:24-35)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jax.nn.relu(nn.Dense(1024)(x))
        x = jax.nn.relu(nn.Dense(256)(x))
        return nn.Dense(6)(x)


class DWConv(nn.Module):
    """Depthwise conv (+BN+act). Reference conv.py:95-99."""
    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Any = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = __import__("math").gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, d=self.d, act=self.act)(x, train)


class LightConv(nn.Module):
    """1x1 conv (no act) + depthwise k (ReLU). Reference conv.py:79-92."""
    c2: int
    k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, act="identity")(x, train)
        return DWConv(self.c2, self.k, act="relu")(x, train)


class ConvTranspose(nn.Module):
    """Transposed conv + BN + act. Reference conv.py:109-126."""
    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Any = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.c2, (self.k, self.k), strides=(self.s, self.s),
                             padding=((self.p, self.p), (self.p, self.p)),
                             use_bias=not self.bn)(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS)(x)
        act = self.act if self.act is not True else "silu"
        return get_act(act if isinstance(act, str) else "identity")(x)


class _Kernel(nn.Module):
    """Bare conv-kernel parameter holder: declares the SAME {kernel} param
    (name, shape, lecun_normal init) an nn.Conv child would, so modules that
    rewrite the convolution algebra stay checkpoint-identical to the Conv
    they replace."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


def _conv_nhwc(x, w, strides, padding):
    dt = jnp.promote_types(x.dtype, w.dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvS2DOut(nn.Module):
    """Drop-in for the stem `Conv(c2, 3, 2)` that emits its output in
    SPACE-TO-DEPTH form: (B, H/4, W/4, 4*c2) with channel order
    (pi, pj, c) for the 2x2 output-pixel block (pi, pj).

    Motivation (VERDICT r4 #1): the baseline stem's (H/2, W/2, 64) bf16
    activation lane-pads 2x in the TPU's (8, 128) tiles, running P1-P3 at
    31%% of peak fwd+bwd. The s2d form packs the same values into 4*c2 >= 128
    lanes. EXACT algebra: y_s2d[I,J,(pi,pj,c)] = y[2I+pi, 2J+pj, c] where y
    is the baseline conv output, realized as ONE k5 s4 conv whose kernel is
    the baseline 3x3 kernel scattered at offsets (2pi+di, 2pj+dj) — the
    parameter tree ({Conv_0/kernel (3,3,cin,c2), BatchNorm_0 c2}) is
    IDENTICAL to the Conv it replaces, so checkpoints/EMA/optimizer state
    transfer verbatim. BN runs on a (..., 4, c2) view: same per-channel
    element set as the baseline, so train-mode statistics match exactly.
    Reference stem rows: ultralytics/cfg/models/v8/yolov8.yaml:19-24,
    conv.py:38-55."""
    c2: int
    act: Any = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        w = _Kernel((3, 3, cin, self.c2), name="Conv_0")()
        w6 = jnp.zeros((5, 5, cin, 2, 2, self.c2), w.dtype)
        for pi in (0, 1):
            for pj in (0, 1):
                w6 = w6.at[2 * pi:2 * pi + 3, 2 * pj:2 * pj + 3, :, pi, pj, :
                           ].set(w)
        w_s2d = w6.reshape(5, 5, cin, 4 * self.c2)
        y = _conv_nhwc(x, w_s2d, (4, 4), ((1, 0), (1, 0)))
        b, h, ww, _ = y.shape
        y = y.reshape(b, h, ww, 4, self.c2)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)(y)
        y = y.reshape(b, h, ww, 4 * self.c2)
        act = self.act if self.act is not True else "silu"
        return get_act(act if isinstance(act, str) else "identity")(y)


class ConvS2DIn(nn.Module):
    """Drop-in for the second stem `Conv(c2, 3, 2)` that CONSUMES the
    space-to-depth form ConvS2DOut emits and returns the standard layout.

    The baseline k3 s2 conv over y becomes a k2 s1 conv over y_s2d: output
    tap (di, dj) of the 3x3 kernel reads y[2i+di-1] = y_s2d[i+w-1, pi] with
    (w, pi) = {di=0: (0,1), di=1: (1,0), di=2: (1,1)} — 9 of the 16
    (w, v, pi, pj) kernel slots are the baseline taps, the rest zero. Exact;
    parameter tree identical to the Conv it replaces (kernel (3,3,c1,c2))."""
    c2: int
    c1: int  # baseline input channels (s2d input carries 4*c1)
    act: Any = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = _Kernel((3, 3, self.c1, self.c2), name="Conv_0")()
        pairs = ((0, 1, 0), (1, 0, 1), (1, 1, 2))  # (w, pi, di)
        w6 = jnp.zeros((2, 2, 2, 2, self.c1, self.c2), w.dtype)
        for (wu, pu, du) in pairs:
            for (wv, pv, dv) in pairs:
                w6 = w6.at[wu, wv, pu, pv].set(w[du, dv])
        w_s2d = w6.reshape(2, 2, 4 * self.c1, self.c2)
        y = _conv_nhwc(x, w_s2d, (1, 1), ((1, 0), (1, 0)))
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)(y)
        act = self.act if self.act is not True else "silu"
        return get_act(act if isinstance(act, str) else "identity")(y)


class Focus(nn.Module):
    """Space-to-channel then conv. Reference conv.py:129-139."""
    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        patches = jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                                   x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        return Conv(self.c2, self.k, self.s)(patches, train)


class GhostConv(nn.Module):
    """Ghost convolution. Reference conv.py:142-154."""
    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s)(x, train)
        y2 = Conv(c_, 5, 1, g=c_)(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class PConv(nn.Module):
    """FasterNet partial conv: 3x3 on dim/n_div channels, rest passthrough.

    Reference conv.py:157-190 (split_cat form).
    """
    n_div: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        dc = dim // self.n_div
        x1, x2 = x[..., :dc], x[..., dc:]
        x1 = nn.Conv(dc, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)(x1)
        return jnp.concatenate([x1, x2], axis=-1)


class RepConv(nn.Module):
    """Rep-style 3x3 + 1x1 (+BN id) parallel block. Reference conv.py:193-291.

    `deploy=True` is the re-parameterized single-conv form (reference
    fuse_convs): one biased 3x3 conv whose weights come from
    `fuse_repconv_variables`, numerically equal to the train form but a
    single MXU pass — the structural merge XLA cannot do on its own (BN
    folding it can; summing three differently-shaped conv branches it
    cannot)."""
    c2: int
    k: int = 3
    s: int = 1
    use_id_bn: bool = False
    act: Any = "silu"
    deploy: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = self.act if self.act is not True else "silu"
        act_fn = get_act(act if isinstance(act, str) else "identity")
        if self.deploy:
            y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                        padding=((1, 1), (1, 1)), use_bias=True,
                        name="fused")(x)
            return act_fn(y)
        y = Conv(self.c2, self.k, self.s, p=1, act="identity")(x, train)
        y = y + Conv(self.c2, 1, self.s, p=0, act="identity")(x, train)
        if self.use_id_bn and x.shape[-1] == self.c2 and self.s == 1:
            y = y + nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS)(x)
        return act_fn(y)


def _fuse_one_repconv(p, bs):
    """Collapse one RepConv train-form param subtree to the deploy form
    (reference conv.py:221-244 get_equivalent_kernel_bias, NHWC layout:
    kernels are (kh, kw, cin, cout)). BN fold: W' = W*(gamma/std),
    b' = beta - mean*gamma/std; the 1x1 kernel zero-pads to the 3x3 center;
    an identity-BN branch contributes a scaled identity kernel."""
    def branch(conv_p, conv_bs):
        kern = conv_p["Conv_0"]["kernel"]
        t = conv_p["BatchNorm_0"]["scale"] / jnp.sqrt(
            conv_bs["BatchNorm_0"]["var"] + BN_EPS)
        return kern * t, conv_p["BatchNorm_0"]["bias"] - \
            conv_bs["BatchNorm_0"]["mean"] * t

    k3, b3 = branch(p["Conv_0"], bs["Conv_0"])
    k1, b1 = branch(p["Conv_1"], bs["Conv_1"])
    kern = k3 + jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    bias = b3 + b1
    if "BatchNorm_0" in p:  # identity-BN branch (use_id_bn, cin == cout)
        t = p["BatchNorm_0"]["scale"] / jnp.sqrt(
            bs["BatchNorm_0"]["var"] + BN_EPS)
        cin = kern.shape[2]
        idx = jnp.arange(cin)
        kern = kern.at[1, 1, idx, idx].add(t)
        bias = bias + p["BatchNorm_0"]["bias"] - bs["BatchNorm_0"]["mean"] * t
    return {"fused": {"kernel": kern, "bias": bias}}


def fuse_repconv_variables(variables):
    """Rewrite a variables dict for the repconv_deploy=True graph: every
    RepConv_* scope's three branches merge into one biased 3x3 conv and its
    batch_stats entries disappear (reference conv.py:268-291 fuse_convs).
    Non-RepConv scopes pass through untouched."""
    from collections.abc import Mapping

    def walk(p, bs):
        new_p, new_bs = {}, {}
        for k, v in p.items():
            sub_bs = bs.get(k, {}) if isinstance(bs, Mapping) else {}
            if (k.startswith("RepConv") and isinstance(v, Mapping)
                    and "Conv_1" in v):
                new_p[k] = _fuse_one_repconv(v, sub_bs)
            elif isinstance(v, Mapping):
                np_, nbs_ = walk(v, sub_bs)
                new_p[k] = np_
                if nbs_:
                    new_bs[k] = nbs_
            else:
                new_p[k] = v
                if isinstance(bs, Mapping) and k in bs:
                    new_bs[k] = bs[k]
        # batch_stats leaves with no params twin (pure-BN scopes) carry over
        if isinstance(bs, Mapping):
            for k, v in bs.items():
                if k not in p:
                    new_bs[k] = v
        return new_p, new_bs

    params, bstats = walk(dict(variables["params"]),
                          dict(variables.get("batch_stats", {})))
    return {"params": params, "batch_stats": bstats}


class ChannelAttention(nn.Module):
    """Reference conv.py:294-304."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(x.shape[-1], (1, 1), use_bias=True)(pooled)
        return x * jax.nn.sigmoid(w)


class SpatialAttention(nn.Module):
    """Reference conv.py:307-320."""
    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = 3 if self.k == 7 else 1
        s = jnp.concatenate([jnp.mean(x, axis=-1, keepdims=True),
                             jnp.max(x, axis=-1, keepdims=True)], axis=-1)
        w = nn.Conv(1, (self.k, self.k), padding=((p, p), (p, p)), use_bias=False)(s)
        return x * jax.nn.sigmoid(w)


class CBAM(nn.Module):
    """Reference conv.py:449-459."""
    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        return SpatialAttention(self.k)(ChannelAttention()(x, train), train)


class GroupBatchnorm2d(nn.Module):
    """Per-group normalize over (C/G, H, W) with learned per-channel affine.

    Reference conv.py:323-343. Deviation: scale initialized to ones (the reference
    uses randn, which makes SRU's weight/sum(weight) ill-conditioned at init).
    Uses the unbiased std like torch.std.
    """
    group_num: int = 16
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # NHWC -> (B, G, C/G * H * W) grouping over channels
        xg = x.transpose(0, 3, 1, 2).reshape(b, self.group_num, -1)
        mean = jnp.mean(xg, axis=2, keepdims=True)
        n = xg.shape[2]
        var = jnp.var(xg, axis=2, keepdims=True) * (n / max(n - 1, 1))
        xg = (xg - mean) / (jnp.sqrt(var) + self.eps)
        xn = xg.reshape(b, c, h, w).transpose(0, 2, 3, 1)
        return xn * weight + bias


class CRU(nn.Module):
    """Channel reconstruct unit of SCConv. Reference conv.py:379-417."""
    op_channel: int
    alpha: float = 0.5
    squeeze_radio: int = 2
    group_size: int = 2
    group_kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        up_c = int(self.alpha * self.op_channel)
        low_c = self.op_channel - up_c
        up, low = x[..., :up_c], x[..., up_c:]
        up = nn.Conv(up_c // self.squeeze_radio, (1, 1), use_bias=False)(up)
        low = nn.Conv(low_c // self.squeeze_radio, (1, 1), use_bias=False)(low)
        gk = self.group_kernel_size
        y1 = nn.Conv(self.op_channel, (gk, gk), padding=((gk // 2, gk // 2),) * 2,
                     feature_group_count=self.group_size, use_bias=True)(up)
        y1 = y1 + nn.Conv(self.op_channel, (1, 1), use_bias=False)(up)
        y2 = jnp.concatenate(
            [nn.Conv(self.op_channel - low_c // self.squeeze_radio, (1, 1),
                     use_bias=False)(low), low], axis=-1)
        out = jnp.concatenate([y1, y2], axis=-1)
        gate = jax.nn.softmax(jnp.mean(out, axis=(1, 2), keepdims=True), axis=-1)
        out = gate * out
        o1, o2 = jnp.split(out, 2, axis=-1)
        return o1 + o2


class SCConv(nn.Module):
    """SRU + CRU. Reference conv.py:420-446."""
    op_channel: int
    group_num: int = 4
    gate_threshold: float = 0.5
    alpha: float = 0.5
    squeeze_radio: int = 2
    group_size: int = 2
    group_kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        # --- SRU (inlined so the GroupBatchnorm scale param is shareable) ---
        c = x.shape[-1]
        weight = self.param("sru_weight", nn.initializers.ones, (c,))
        bias = self.param("sru_bias", nn.initializers.zeros, (c,))
        b, h, w, _ = x.shape
        xg = x.transpose(0, 3, 1, 2).reshape(b, self.group_num, -1)
        mean = jnp.mean(xg, axis=2, keepdims=True)
        n = xg.shape[2]
        var = jnp.var(xg, axis=2, keepdims=True) * (n / max(n - 1, 1))
        xg = (xg - mean) / (jnp.sqrt(var) + 1e-10)
        gn_x = xg.reshape(b, c, h, w).transpose(0, 2, 3, 1) * weight + bias
        w_gamma = weight / jnp.sum(weight)
        reweights = jax.nn.sigmoid(gn_x * w_gamma)
        info = jnp.where(reweights >= self.gate_threshold, gn_x, 0.0)
        noninfo = jnp.where(reweights < self.gate_threshold, gn_x, 0.0)
        x11, x12 = jnp.split(info, 2, axis=-1)
        x21, x22 = jnp.split(noninfo, 2, axis=-1)
        x = jnp.concatenate([x11 + x22, x12 + x21], axis=-1)
        # --- CRU ---
        return CRU(self.op_channel, self.alpha, self.squeeze_radio,
                   self.group_size, self.group_kernel_size)(x, train)


# ---------------------------------------------------------------------------
# Blocks (reference block.py)
# ---------------------------------------------------------------------------

class AddConv(nn.Module):
    """conv + BN + LeakyReLU(0.1)/ReLU6 block. Reference block.py:24-45 (add_conv)."""
    c2: int
    k: int
    s: int
    leaky: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.k - 1) // 2
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((pad, pad), (pad, pad)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)(x)
        return get_act("leaky" if self.leaky else "relu6")(x)


class Bottleneck(nn.Module):
    """Standard bottleneck. Reference block.py:553-565."""
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1)(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class PconvBottleneck(nn.Module):
    """PConv -> Conv3 -> 1x1. Reference block.py:568-586."""
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = PConv(4)(x, train)
        y = Conv(c_, 3, 1, p=1)(y, train)
        y = Conv2d(self.c2, 1, 1, g=self.g, bias=False)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class PconvBottleneckN(nn.Module):
    """PConv -> 1x1 Conv -> 1x1. Reference block.py:589-607."""
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = PConv(4)(x, train)
        y = Conv(2 * c_, 1, 1)(y, train)
        y = Conv2d(self.c2, 1, 1, g=self.g, bias=False)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class SCConvBottleneck(nn.Module):
    """SCConv -> 1x1 Conv(BN,SiLU). Reference block.py:610-627."""
    c2: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SCConv(x.shape[-1])(x, train)
        y = Conv(self.c2, 1, 1)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class SCPWBottleneck(nn.Module):
    """SCConv -> bare 1x1 (bias). Reference block.py:630-645."""
    c2: int
    shortcut: bool = True
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SCConv(x.shape[-1])(x, train)
        y = Conv2d(self.c2, 1, 1, g=self.g, bias=True)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class SCConv3Bottleneck(nn.Module):
    """SCConv -> Conv3(BN,SiLU). Reference block.py:648-662."""
    c2: int
    shortcut: bool = True
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = SCConv(x.shape[-1])(x, train)
        y = Conv(self.c2, 3, 1, g=self.g)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class Conv3SCBottleneck(nn.Module):
    """Conv3(BN,SiLU) -> SCConv. Reference block.py:684-700."""
    c2: int
    shortcut: bool = True
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 3, 1, g=self.g)(x, train)
        y = SCConv(self.c2)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class SCPWPWBottleneck(nn.Module):
    """SCConv -> 1x1 Conv(BN,SiLU) x2 -> bare 1x1. Reference block.py:665-681."""
    c2: int
    shortcut: bool = True
    g: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = SCConv(c1)(x, train)
        y = Conv(2 * c1, 1, 1, g=self.g)(y, train)
        y = Conv2d(self.c2, 1, 1, g=self.g, bias=False)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class GhostBottleneck(nn.Module):
    """Reference block.py:535-550."""
    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1)(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act="identity")(y, train)
        y = GhostConv(self.c2, 1, 1)(y, train)  # note: ref uses act=False on 2nd pw
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act="identity")(x, train)
            sc = Conv(self.c2, 1, 1, act="identity")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else 0.0
        return y + sc


class C1(nn.Module):
    """Reference block.py:341-352."""
    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1)(x, train)
        z = y
        for _ in range(self.n):
            z = Conv(self.c2, 3)(z, train)
        return z + y


class C2(nn.Module):
    """Reference block.py:355-370."""
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for _ in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, (3, 3), 1.0)(a, train)
        return Conv(self.c2, 1)([a, b], train)


class C2f(nn.Module):
    """Cross-stage partial with dense growth. Reference block.py:373-393.

    `bottleneck` selects the inner block family, covering the fork's
    FasterC2f(_N)/SCC2f/SC_PW_C2f/SC_Conv3_C2f/Conv3_SC_C2f/SC_PW_PW_C2f wrappers
    (block.py:396-470).
    """
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    bottleneck: str = "standard"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1)(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        ctor = {
            "standard": lambda: Bottleneck(c, self.shortcut, self.g, (3, 3), 1.0),
            "pconv": lambda: PconvBottleneck(c, self.shortcut, self.g, 1.0),
            "pconv_n": lambda: PconvBottleneckN(c, self.shortcut, self.g, 1.0),
            "scconv": lambda: SCConvBottleneck(c, self.shortcut),
            "sc_pw": lambda: SCPWBottleneck(c, self.shortcut, self.g),
            "sc_conv3": lambda: SCConv3Bottleneck(c, self.shortcut, self.g),
            "conv3_sc": lambda: Conv3SCBottleneck(c, self.shortcut, self.g),
            "sc_pw_pw": lambda: SCPWPWBottleneck(c, self.shortcut, self.g),
        }[self.bottleneck]
        for _ in range(self.n):
            ys.append(ctor()(ys[-1], train))
        return Conv(self.c2, 1)(ys, train)  # virtual concat (split-K conv)


class C3(nn.Module):
    """Reference block.py:473-486."""
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[Tuple[int, int], ...] = ((1, 1), (3, 3))

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1)(x, train)
        for _ in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, self.k, 1.0)(a, train)
        b = Conv(c_, 1, 1)(x, train)
        return Conv(self.c2, 1)([a, b], train)


class C3x(nn.Module):
    """C3 with cross (1,3)/(3,1) kernels. Reference block.py:489-496."""
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1)(x, train)
        for _ in range(self.n):
            y = CrossConv(c_, (1, 3))(a, train)
            y = CrossConv(c_, (3, 1))(y, train)
            a = a + y if self.shortcut else y
        b = Conv(c_, 1, 1)(x, train)
        return Conv(self.c2, 1)([a, b], train)


class CrossConv(nn.Module):
    """Rectangular-kernel Conv+BN+SiLU used by C3x."""
    c2: int
    k: Tuple[int, int] = (1, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.k
        x = nn.Conv(self.c2, (kh, kw),
                    padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)(x)
        return jax.nn.silu(x)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner (reference block.py:515-522)."""
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .transformer import TransformerBlock
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1)(x, train)
        a = TransformerBlock(c_, 4, self.n)(a, train)
        b = Conv(c_, 1, 1)(x, train)
        return Conv(self.c2, 1)([a, b], train)


class RepC3(nn.Module):
    """Reference block.py:499-512. `deploy` re-parameterizes the RepConvs."""
    c2: int
    n: int = 3
    e: float = 1.0
    deploy: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(self.c2, 1, 1)(x, train)
        for _ in range(self.n):
            a = RepConv(c_, deploy=self.deploy)(a, train)
        b = Conv(self.c2, 1, 1)(x, train)
        y = a + b
        if c_ != self.c2:
            y = Conv(self.c2, 1, 1)(y, train)
        return y


class C3Ghost(nn.Module):
    """Reference block.py:525-532."""
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1)(x, train)
        for _ in range(self.n):
            a = GhostBottleneck(c_)(a, train)
        b = Conv(c_, 1, 1)(x, train)
        return Conv(self.c2, 1)([a, b], train)


class BottleneckCSP(nn.Module):
    """Reference block.py:737-756."""
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1)(x, train)
        for _ in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, e=1.0)(a, train)
        y1 = Conv2d(c_, 1, 1, bias=False)(a, train)
        y2 = Conv2d(c_, 1, 1, bias=False)(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)(y)
        return Conv(self.c2, 1, 1)(jax.nn.silu(y), train)


class SPP(nn.Module):
    """Reference block.py:306-320."""
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = (sum(t.shape[-1] for t in x) if isinstance(x, (list, tuple))
                else x.shape[-1])
        x = Conv(c_in // 2, 1, 1)(x, train)
        pools = [max_pool_same(x, k) for k in self.k]
        return Conv(self.c2, 1, 1)([x] + pools, train)


class SPPF(nn.Module):
    """Reference block.py:323-338."""
    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = (sum(t.shape[-1] for t in x) if isinstance(x, (list, tuple))
                else x.shape[-1])
        x = Conv(c_in // 2, 1, 1)(x, train)
        y1 = max_pool_same(x, self.k)
        y2 = max_pool_same(y1, self.k)
        y3 = max_pool_same(y2, self.k)
        return Conv(self.c2, 1, 1)([x, y1, y2, y3], train)


class HGStem(nn.Module):
    """Reference block.py:257-282."""
    cm: int
    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.cm, 3, 2, act="relu")(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm // 2, 2, 1, p=0, act="relu")(x, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm, 2, 1, p=0, act="relu")(x2, train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([x1, x2], axis=-1)
        x = Conv(self.cm, 3, 2, act="relu")(x, train)
        return Conv(self.c2, 1, 1, act="relu")(x, train)


class HGBlock(nn.Module):
    """Reference block.py:285-303."""
    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ys = [x]
        for _ in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, self.k)(ys[-1], train))
            else:
                ys.append(Conv(self.cm, self.k, act="relu")(ys[-1], train))
        y = Conv(self.c2 // 2, 1, 1, act="relu")(ys, train)  # virtual concat
        y = Conv(self.c2, 1, 1, act="relu")(y, train)
        return y + x if self.shortcut and x.shape[-1] == self.c2 else y


class Proto(nn.Module):
    """Segmentation mask protos. Reference block.py:242-254."""
    c_: int = 256
    c2: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c_, 3)(x, train)
        x = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2), use_bias=True)(x)
        x = Conv(self.c_, 3)(x, train)
        return Conv(self.c2, 1)(x, train)


class RFBblock(nn.Module):
    """4-branch dilated receptive-field block. Reference block.py:703-734.

    Output channels == input channels (4 branches of in/4 each, concatenated).
    """

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = x.shape[-1] // 4
        b0 = Conv2d(inter, 1, 1, p=0)(x, train)
        b1 = Conv2d(inter, 3, 1, p=1)(Conv2d(inter, 1, 1, p=0)(x, train), train)
        b2 = Conv2d(inter, 1, 1, p=0)(x, train)
        b2 = Conv2d(inter, 3, 1, p=1)(b2, train)
        b2 = Conv2d(inter, 3, 1, p=2, d=2)(b2, train)
        b3 = Conv2d(inter, 1, 1, p=0)(x, train)
        b3 = Conv2d(inter, 5, 1, p=2)(b3, train)
        b3 = Conv2d(inter, 3, 1, p=3, d=3)(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class AsffTribeLevel(nn.Module):
    """Adaptive 3-level spatial feature fusion. Reference block.py:48-115.

    Input: [deepest P5, P4, P3]. The reference hardcodes dims [512, 512, 256]
    and only works at the L scale (block.py:48-115 warns); here dims derive
    from the actual input channels — identical modules and param tree at L,
    and other scale tokens (n/s/m/x) build too. When a branch's channel count
    differs from the level's (possible at non-L scales where P5 != P4 width),
    an aligning 1x1 AddConv is inserted; at L none is created.

    commute_weights: the 8-channel compress convs on upsampled branches run
    at the PRE-upsample resolution and the tiny output is upsampled instead
    — exact, because a 1x1 stride-1 conv + per-channel BN + pointwise act
    commutes with integer nearest upsample (each source pixel maps to an
    identical block; batch stats over the repeated multiset are unchanged).
    This keeps the fat 40/80px 256-512ch upsampled tensors out of the
    weight branch entirely (HBM-traffic fix for the 36%-of-peak roofline
    row). Param tree is identical either way.
    """
    level: int
    commute_weights: bool = ASFF_COMMUTE

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        dim = [x.shape[-1] for x in xs]  # [512, 512, 256] at the L scale
        inter = dim[self.level]
        x0, x1, x2 = xs
        compress_c = 8

        def align(t):
            # non-L scales only: bring a mismatched branch to `inter` ch
            return t if t.shape[-1] == inter else AddConv(inter, 1, 1)(t, train)

        # (branch tensor at full level resolution, pre-upsample tensor, scale)
        if self.level == 0:
            r0 = (x0, x0, 1)
            r1 = (align(nn.max_pool(x1, (2, 2), strides=(2, 2))),) * 2 + (1,)
            r2 = max_pool_same(x2, 3, 2)
            r2 = (AddConv(inter, 3, 2)(r2, train),) * 2 + (1,)
        elif self.level == 1:
            a0 = align(x0)
            r0 = (upsample_nearest(a0, 2), a0, 2)
            r1 = (x1, x1, 1)
            r2 = (AddConv(inter, 3, 2)(x2, train),) * 2 + (1,)
        else:
            a0 = AddConv(inter, 1, 1)(x0, train)
            a1 = AddConv(inter, 1, 1)(x1, train)
            r0 = (upsample_nearest(a0, 4), a0, 4)
            r1 = (upsample_nearest(a1, 2), a1, 2)
            r2 = (x2, x2, 1)
        expand_c = inter
        ws = []
        for full, pre, scale in (r0, r1, r2):
            cmp = AddConv(compress_c, 1, 1)
            if self.commute_weights and scale > 1:
                ws.append(upsample_nearest(cmp(pre, train), scale))
            else:
                ws.append(cmp(full, train))
        w = Conv2d(3, 1, 1, p=0)(jnp.concatenate(ws, axis=-1), train)
        w = jax.nn.softmax(w, axis=-1)
        fused = (r0[0] * w[..., 0:1] + r1[0] * w[..., 1:2]
                 + r2[0] * w[..., 2:3])
        return AddConv(expand_c, 3, 1)(fused, train)


class AsffDoubLevel(nn.Module):
    """2-level ASFF. Reference block.py:118-162.

    Dims derive from the input channels (identical to the reference's
    hardcoded [512, 256] at the L scale; other scales build too — see
    AsffTribeLevel). commute_weights: exact weight-branch commute past the
    nearest upsample (see AsffTribeLevel).
    """
    level: int
    commute_weights: bool = ASFF_COMMUTE

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        x0, x1 = xs
        inter = x0.shape[-1] if self.level == 0 else x1.shape[-1]
        expand_c = inter
        compress_c = 16
        if self.level == 0:
            r0 = x0
            r1 = AddConv(inter, 3, 2)(x1, train)
            w0 = AddConv(compress_c, 1, 1)(r0, train)
        else:
            a0 = AddConv(inter, 1, 1)(x0, train)
            r0 = upsample_nearest(a0, 2)
            r1 = x1
            cmp0 = AddConv(compress_c, 1, 1)
            w0 = (upsample_nearest(cmp0(a0, train), 2)
                  if self.commute_weights else cmp0(r0, train))
        w1 = AddConv(compress_c, 1, 1)(r1, train)
        w = Conv2d(2, 1, 1, p=0)(jnp.concatenate([w0, w1], axis=-1), train)
        w = jax.nn.softmax(w, axis=-1)
        fused = r0 * w[..., 0:1] + r1 * w[..., 1:2]
        return AddConv(expand_c, 3, 1)(fused, train)


class MFRU(nn.Module):
    """Multi-scale feature reconstruct unit (SCConv-based). Reference block.py:164-217.

    Deviation noted: the reference *shares* one scconv512/pwconv instance across
    levels 0 and 1 (same nn.Module applied twice); we share identically by reusing
    the same submodule instance. Dims derive from the input channels (the
    reference hardcodes 512/256, L-scale only); when P5/P4 widths differ
    (non-L scales), P4 is aligned to P5's width with a 1x1 AddConv so the
    shared SCConv still applies — no extra module is created at L.
    """
    level: int = 0  # unused; kept for yaml-arg parity

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        c_deep = xs[0].shape[-1]   # 512 at L
        c_out = xs[2].shape[-1]    # 256 at L
        sc_deep = SCConv(c_deep)
        sc_out = SCConv(c_out)
        pw = Conv2d(c_out, 1, 1, p=0)
        x1 = (xs[1] if xs[1].shape[-1] == c_deep
              else AddConv(c_deep, 1, 1)(xs[1], train))
        l0 = upsample_nearest(pw(sc_deep(xs[0], train), train), 4)
        l1 = upsample_nearest(pw(sc_deep(x1, train), train), 2)
        l2 = sc_out(xs[2], train)
        compress_c = 16
        w0 = Conv2d(compress_c, 1, 1, p=0)(l0, train)
        w1 = Conv2d(compress_c, 1, 1, p=0)(l1, train)
        w2 = Conv2d(compress_c, 1, 1, p=0)(l2, train)
        w = Conv2d(3, 1, 1, p=0)(jnp.concatenate([w0, w1, w2], axis=-1), train)
        w = jax.nn.softmax(w, axis=-1)
        fused = l0 * w[..., 0:1] + l1 * w[..., 1:2] + l2 * w[..., 2:3]
        return sc_out(fused, train)


class Classify(nn.Module):
    """Classification head. Reference head.py:244-260."""
    c2: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = 1280
        x = Conv(c_, self.k, self.s)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.c2)(x)
