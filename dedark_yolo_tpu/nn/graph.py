"""YAML graph builder and DetectionModel.

Consumes the same `[from, repeats, module, args]` YAML schema as the reference
(ultralytics/nn/tasks.py:803-921 parse_model), including the special channel rules:
  - depth/width/max_channels compound scaling per n/s/m/l/x (tasks.py:815-821);
  - c2 = make_divisible(min(c2, max_channels) * width, 8) unless c2 == nc;
  - lowlight_recovery -> c2 = args[0] (tasks.py:888-889);
  - MFRU / AsffDoubLevel / AsffTribeLevel -> output width derived from the
    actual from-layer input channels (the reference hardcodes the L-scale
    values 256 / 512,256 / 512,512,256 at :890-896 and only builds at L;
    here every n/s/m/l/x scale token builds, and at L the derived dims —
    and the flax param tree — match the reference exactly);
  - Detect/AsffDetect get the ch list of their from-layers (:897-900).

TPU design: parsing produces a static tuple of LayerSpec; the flax `YOLOGraph`
module instantiates one submodule per spec in setup() and walks them in __call__
with a saved-outputs dict — all of it traced once into a single XLA graph (no
per-layer Python in the hot path after jit). Strides are tracked statically by the
parser (the reference calibrates them with a dummy 256x256 forward,
tasks.py:283-293 — unnecessary here since the graph is static).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from . import layers as L
from .enhance import LowlightRecovery
from .heads import Detect, AsffDetect, decode_detections


def make_divisible(x, divisor=8):
    return math.ceil(x / divisor) * divisor


@dataclass(frozen=True)
class LayerSpec:
    i: int                      # layer index
    f: Tuple[int, ...]          # from-layer indices (-1 = previous); len>1 = multi-input
    n: int                      # effective repeats (after depth scaling)
    name: str                   # module name from yaml
    args: Tuple[Any, ...]       # resolved constructor args (post channel rules)
    c2: int                     # output channels
    stride: int                 # cumulative spatial stride of the output


# yaml names of modules whose first arg is an output-channel count subject to
# width scaling (reference tasks.py:856-874 list).
_CONVLIKE = {
    "Conv", "ConvTranspose", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP",
    "SPPF", "DWConv", "Focus", "BottleneckCSP", "C1", "C2", "C2f", "C3", "C3Ghost",
    "C3x", "C3TR", "RepC3", "FasterC2f_N", "FasterC2f", "PconvBottleneck",
    "PconvBottleneck_n", "SCConvBottleneck", "SCC2f", "SC_PW_Bottleneck",
    "SC_PW_C2f", "SC_Conv3_Bottleneck", "SC_Conv3_C2f", "Conv3_SC_C2f",
    "Conv3_SC_Bottleneck", "SC_PW_PW_C2f", "Classify",
}
_REPEAT_BLOCKS = {
    "BottleneckCSP", "C1", "C2", "C2f", "C3", "C3Ghost", "C3x", "C3TR", "RepC3",
    "FasterC2f_N", "FasterC2f", "SCC2f", "SC_PW_C2f", "SC_Conv3_C2f",
    "Conv3_SC_C2f", "SC_PW_PW_C2f",
}
_C2F_FAMILY = {
    "C2f": "standard", "FasterC2f": "pconv", "FasterC2f_N": "pconv_n",
    "SCC2f": "scconv", "SC_PW_C2f": "sc_pw", "SC_Conv3_C2f": "sc_conv3",
    "Conv3_SC_C2f": "conv3_sc", "SC_PW_PW_C2f": "sc_pw_pw",
}
_HEADS = {"Detect", "AsffDetect", "Segment", "Pose", "RTDETRDecoder"}
# spatial stride multiplier contributed by a module (static)
_STRIDE2 = {"Focus", "HGStem"}

# modules whose __call__ accepts a list-of-tensors input as a *virtual*
# channel-concat (their leading 1x1 conv splits across K — see
# layers.ConcatConv); for these a graph-level Concat can stay lazy
_LIST_INPUT_OK = set(_C2F_FAMILY) | {"C2", "C3", "C3x", "C3TR", "C3Ghost",
                                     "SPP", "SPPF"}


class LazyConcat(list):
    """A graph-level channel-concat kept as its unconcatenated parts.

    Produced by Concat layers; consumed either by a _LIST_INPUT_OK module
    (which contracts the parts with split-K partial dots, never materializing
    the concat buffer) or materialized with jnp.concatenate at the first
    consumer that needs a dense tensor."""


def _dense(v):
    if isinstance(v, L.LazyUp):
        return v.dense()
    if isinstance(v, LazyConcat):
        return jnp.concatenate(
            [p.dense() if isinstance(p, L.LazyUp) else p for p in v], axis=-1)
    return v


def _first_op_is_1x1(spec: LayerSpec) -> bool:
    if spec.name in _LIST_INPUT_OK:
        return True
    if spec.name == "Conv":
        k = spec.args[1] if len(spec.args) > 1 else 1
        s = spec.args[2] if len(spec.args) > 2 else 1
        return k == 1 and s == 1
    return False


def _spec_takes_list(spec: LayerSpec, inp=None) -> bool:
    # fpn-fused concats (a LazyUp part) stay lazy whenever the consumer
    # leads with a 1x1 conv, independent of the ELIDE_CONCAT experiment flag
    if (isinstance(inp, LazyConcat)
            and any(isinstance(p, L.LazyUp) for p in inp)):
        return _first_op_is_1x1(spec)
    if not L.ELIDE_CONCAT:
        return False
    return _first_op_is_1x1(spec)


def find_fpn_fuse(specs, save) -> Tuple[int, ...]:
    """Indices of nn.Upsample layers eligible for the top-down fuse: the
    upsample feeds ONLY the next layer, a Concat, which feeds ONLY the layer
    after it, whose first op is a 1x1 s1 conv (C2f family / 1x1 Conv). The
    upsample is then kept lazy and its 1x1 partial dot runs pre-upsample
    (layers.py LazyUp/ConcatConv)."""
    out = []
    for i, s in enumerate(specs):
        if s.name != "nn.Upsample" or i + 2 >= len(specs):
            continue
        cat, nxt = specs[i + 1], specs[i + 2]
        if (s.f == (-1,) and s.i not in save
                and cat.name == "Concat" and -1 in cat.f
                and cat.i not in save and nxt.f == (-1,)
                and _first_op_is_1x1(nxt)):
            out.append(s.i)
    return tuple(out)


def parse_model(d: dict, ch: int = 3, verbose: bool = False):
    """Parse a model yaml dict into (specs, savelist, head_info).

    Returns:
        specs: tuple[LayerSpec], one per yaml row.
        save: sorted list of layer indices whose outputs must be kept.
        head: dict(name, nc, strides, from_idx, ch_list) for the detect head.
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    depth, width, max_channels = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0), float("inf")
    if scales:
        scale = d.get("scale") or tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]

    ch_list: List[int] = [ch]
    stride_list: List[int] = [1]
    specs: List[LayerSpec] = []
    save: List[int] = []
    head = None

    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, m, args) in enumerate(rows):
        f_tuple = tuple(f) if isinstance(f, (list, tuple)) else (f,)
        # normalize relative from-indices (e.g. -2) to absolute layer indices;
        # -1 (previous layer) stays symbolic (reference keeps x % i, tasks.py:915)
        f_tuple = tuple(x if x == -1 else x % i for x in f_tuple)
        args = list(args)
        for j, a in enumerate(args):
            if isinstance(a, list):
                args[j] = tuple(a)  # keep LayerSpec hashable (e.g. kpt_shape)
            if isinstance(a, str):
                if a == "nc":
                    args[j] = nc
                elif a in ("None", "none"):
                    args[j] = None
                elif a in ("True", "False"):
                    args[j] = a == "True"
        n_eff = max(round(n * depth), 1) if n > 1 else n

        def in_ch(fi):
            return ch_list[fi] if fi != -1 else ch_list[-1]

        def in_stride(fi):
            return stride_list[fi] if fi != -1 else stride_list[-1]

        c1 = in_ch(f_tuple[0])
        stride = in_stride(f_tuple[0])

        if m == "Classify" and i == len(rows) - 1:
            # terminal Classify layer = classification head (the reference's
            # c2 != nc guard keeps nc unscaled, tasks.py:864-866)
            head = {"name": "Classify", "nc": args[0], "strides": (stride,),
                    "from": f_tuple, "ch": (c1,), "index": i}
            c2 = args[0]
        elif m in _CONVLIKE:
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c2, *args[1:]]
            if m in _REPEAT_BLOCKS:
                args.insert(1, n_eff)
                n_eff = 1
            s = args[2] if m in ("Conv", "DWConv") and len(args) > 2 else 1
            if m in _STRIDE2:
                s = 2 if m == "Focus" else 4
            if m == "ConvTranspose":
                stride = max(stride // (args[2] if len(args) > 2 else 2), 1)
            else:
                stride = stride * (s if isinstance(s, int) else 1)
        elif m in ("HGStem",):
            c2 = args[1]
            stride = stride * 4
        elif m in ("HGBlock",):
            c2 = args[1]
            args.insert(3, n_eff)
            n_eff = 1
        elif m == "nn.Upsample":
            c2 = c1
            sf = int(args[1]) if len(args) > 1 and args[1] else 2
            stride = max(stride // sf, 1)
        elif m == "nn.BatchNorm2d":
            c2 = c1
        elif m == "Concat":
            c2 = sum(in_ch(x) for x in f_tuple)
        elif m == "lowlight_recovery":
            c2 = args[0]
        elif m == "MFRU":
            c2 = in_ch(f_tuple[2])  # 256 at L; derived so every scale builds
            stride = in_stride(f_tuple[2])
        elif m in ("AsffDoubLevel", "AsffTribeLevel"):
            # output channels = the fused level's input channels (equals the
            # reference's hardcoded 512/512/256 at the L scale; derived here
            # so every scale token builds — see layers.py AsffTribeLevel)
            c2 = in_ch(f_tuple[args[0]])
            stride = in_stride(f_tuple[args[0]])
        elif m == "RFBblock":
            c2 = (c1 // 4) * 4
        elif m in ("PConv",):
            c2 = c1
        elif m in ("SCConv",):
            c2 = c1
            args = [c1, *args[1:]]
        elif m in _HEADS:
            ch_ins = [in_ch(x) for x in f_tuple]
            strides_in = tuple(in_stride(x) for x in f_tuple)
            if m == "Segment" and len(args) > 2:
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            head = {"name": m, "nc": args[0], "strides": strides_in,
                    "from": f_tuple, "ch": tuple(ch_ins), "index": i,
                    "args": tuple(args)}
            c2 = 0
        elif m == "AIFI":
            c2 = c1
            args = [c1, *args]
        elif m in ("CBAM", "ChannelAttention", "SpatialAttention"):
            c2 = c1
        else:
            raise NotImplementedError(f"module '{m}' not supported by parse_model")

        specs.append(LayerSpec(i=i, f=f_tuple, n=n_eff, name=m,
                               args=tuple(args), c2=c2, stride=stride))
        save.extend(x % i for x in f_tuple if x != -1)
        if i == 0:
            ch_list = []
            stride_list = []
        ch_list.append(c2)
        stride_list.append(stride)
        if verbose:
            print(f"{i:>3} {str(f_tuple):>18} {n_eff:>3} {m:<20} {args} -> c2={c2} s={stride}")

    if head is None:
        raise ValueError("model yaml has no Detect head")
    return tuple(specs), sorted(set(save)), head


def _build_module(spec: LayerSpec, head: dict, enhance_impl: str = "xla",
                  contrast_mode: str = "channel",
                  repconv_deploy: bool = False):
    """Instantiate the flax module for a LayerSpec (None for functional layers)."""
    name, a = spec.name, list(spec.args)
    if name == "Conv":
        return L.Conv(c2=a[0], k=a[1] if len(a) > 1 else 1,
                      s=a[2] if len(a) > 2 else 1)
    if name == "DWConv":
        return L.DWConv(c2=a[0], k=a[1] if len(a) > 1 else 1,
                        s=a[2] if len(a) > 2 else 1)
    if name == "ConvTranspose":
        return L.ConvTranspose(c2=a[0], k=a[1] if len(a) > 1 else 2,
                               s=a[2] if len(a) > 2 else 2)
    if name == "Focus":
        return L.Focus(c2=a[0], k=a[1] if len(a) > 1 else 1)
    if name == "GhostConv":
        return L.GhostConv(c2=a[0], k=a[1] if len(a) > 1 else 1,
                           s=a[2] if len(a) > 2 else 1)
    if name in _C2F_FAMILY:
        return L.C2f(c2=a[0], n=a[1], shortcut=a[2] if len(a) > 2 else False,
                     bottleneck=_C2F_FAMILY[name])
    if name == "C1":
        return L.C1(c2=a[0], n=a[1])
    if name == "C2":
        return L.C2(c2=a[0], n=a[1], shortcut=a[2] if len(a) > 2 else True)
    if name == "C3":
        return L.C3(c2=a[0], n=a[1], shortcut=a[2] if len(a) > 2 else True)
    if name == "C3x":
        return L.C3x(c2=a[0], n=a[1], shortcut=a[2] if len(a) > 2 else True)
    if name == "C3TR":
        return L.C3TR(c2=a[0], n=a[1], shortcut=a[2] if len(a) > 2 else True)
    if name == "AIFI":
        from .transformer import AIFI
        return AIFI(c=a[0] if a else 256)
    if name == "C3Ghost":
        return L.C3Ghost(c2=a[0], n=a[1])
    if name == "RepC3":
        return L.RepC3(c2=a[0], n=a[1], deploy=repconv_deploy)
    if name == "BottleneckCSP":
        return L.BottleneckCSP(c2=a[0], n=a[1], shortcut=a[2] if len(a) > 2 else True)
    if name == "Bottleneck":
        return L.Bottleneck(c2=a[0])
    if name == "GhostBottleneck":
        return L.GhostBottleneck(c2=a[0], k=a[1] if len(a) > 1 else 3,
                                 s=a[2] if len(a) > 2 else 1)
    if name == "SPP":
        return L.SPP(c2=a[0], k=tuple(a[1]) if len(a) > 1 else (5, 9, 13))
    if name == "SPPF":
        return L.SPPF(c2=a[0], k=a[1] if len(a) > 1 else 5)
    if name == "HGStem":
        return L.HGStem(cm=a[0], c2=a[1])
    if name == "HGBlock":
        return L.HGBlock(cm=a[0], c2=a[1], k=a[2] if len(a) > 2 else 3, n=a[3])
    if name == "lowlight_recovery":
        return LowlightRecovery(out_channels=a[0], impl=enhance_impl,
                                contrast_mode=contrast_mode)
    if name == "AsffTribeLevel":
        return L.AsffTribeLevel(level=a[0])
    if name == "AsffDoubLevel":
        return L.AsffDoubLevel(level=a[0])
    if name == "MFRU":
        return L.MFRU(level=a[0] if a else 0)
    if name == "RFBblock":
        return L.RFBblock()
    if name == "PConv":
        return L.PConv(n_div=a[1] if len(a) > 1 else 4)
    if name == "SCConv":
        return L.SCConv(op_channel=a[0])
    if name == "CBAM":
        return L.CBAM()
    if name == "Classify":
        return L.Classify(c2=a[0])
    if name == "Detect":
        return Detect(nc=head["nc"], strides=head["strides"])
    if name == "AsffDetect":
        return AsffDetect(nc=head["nc"], strides=head["strides"])
    if name == "Segment":
        from .heads import Segment
        ha = head.get("args", ())
        return Segment(nc=head["nc"], nm=ha[1] if len(ha) > 1 else 32,
                       npr=ha[2] if len(ha) > 2 else 256,
                       strides=head["strides"])
    if name == "Pose":
        from .heads import Pose
        ha = head.get("args", ())
        kpt = tuple(ha[1]) if len(ha) > 1 and ha[1] else (17, 3)
        return Pose(nc=head["nc"], kpt_shape=kpt, strides=head["strides"])
    if name == "RTDETRDecoder":
        from .heads import RTDETRDecoder
        # optional yaml args beyond nc: [nc, hd, nq, ndl] (reference signature
        # order head.py:266-283; only nc appears in the stock yaml)
        ha = list(head.get("args", ()))
        return RTDETRDecoder(nc=head["nc"],
                             hd=ha[1] if len(ha) > 1 else 256,
                             nq=ha[2] if len(ha) > 2 else 300,
                             ndl=ha[3] if len(ha) > 3 else 6,
                             strides=head["strides"])
    if name in ("nn.Upsample", "Concat", "nn.BatchNorm2d"):
        return None  # functional
    raise NotImplementedError(f"no builder for module '{name}'")


def _module_call(m, x, train):
    return m(x, train=train)


# lifted remat of a single layer call: the backward rematerializes the
# layer's internals instead of saving them (train arg static; BN batch_stats
# updates pass through the lifted transform — pinned by tests/test_graph.py)
_REMAT_CALL = nn.remat(_module_call, static_argnums=(2,))


def _enhance_call(m, x, dedark_A, IcA, train):
    return m(x, dedark_A=dedark_A, IcA=IcA, train=train)


# remat for the lowlight_recovery layer (its own call signature): the filter
# chain saves many FULL-RESOLUTION residuals for its VJP (tx, per-stage x,
# lum, blur — ~1 GB at b64/640 bf16) while its recompute is ~10 ms of
# VPU work, so it is the cheapest HBM to reclaim in the whole graph
_REMAT_ENHANCE = nn.remat(_enhance_call, static_argnums=(4,))


def find_s2d_stem(specs, save) -> Optional[Tuple[int, int]]:
    """Locate the (first, second) stride-2 3x3 stem Conv pair eligible for
    the space-to-depth rewrite (layers.py ConvS2DOut/ConvS2DIn): the first
    Conv must be fed by the raw image (optionally through lowlight_recovery),
    feed ONLY the second Conv, and both must be plain k3 s2 Convs."""
    for i, s in enumerate(specs):
        if s.name == "lowlight_recovery":
            continue
        if (s.name == "Conv" and s.n == 1 and s.f == (-1,)
                and len(s.args) > 2 and s.args[1] == 3 and s.args[2] == 2
                and i + 1 < len(specs) and s.i not in save):
            nxt = specs[i + 1]
            if (nxt.name == "Conv" and nxt.n == 1 and nxt.f == (-1,)
                    and len(nxt.args) > 2 and nxt.args[1] == 3
                    and nxt.args[2] == 2):
                return (i, i + 1)
        return None
    return None


class YOLOGraph(nn.Module):
    """The whole detection network as one flax module.

    __call__ returns the raw per-level head maps (B, H, W, 4*reg_max + nc) — the
    training output. Use heads.decode_detections for the eval decode (equivalent
    of reference head.py:66-93).
    """
    specs: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]
    head: FrozenDict
    enhance_impl: str = "xla"  # 'pallas' = fused VMEM enhance kernel (eval path)
    contrast_mode: str = "channel"  # 'reference' = torch-fork bit-faithful contrast
    repconv_deploy: bool = False  # re-parameterized RepConv single-conv form
    # layers with index <= remat_upto recompute their activations in the
    # backward pass (jax.checkpoint via linen's lifted remat). The early
    # high-resolution stages hold the largest saved activations (P1-P3 bf16
    # maps, lane-padded 2x at 64ch) while being bandwidth-bound and cheap to
    # recompute — rematting them trades ~free FLOPs for the HBM that caps the
    # train batch size. -1 = off (inference never pays: no backward exists).
    remat_upto: int = -1
    # space-to-depth stem rewrite (VERDICT r4 #1): the first two stride-2
    # Convs run in s2d form so the (H/2, W/2, 64) activation never exists in
    # its lane-padded layout. Exact algebra, checkpoint-identical params
    # (layers.py ConvS2DOut/ConvS2DIn docstrings).
    stem_s2d: bool = False
    # FPN top-down fuse (VERDICT r4 #2): eligible Upsample outputs stay lazy
    # and the consuming 1x1 conv contracts them at LOW resolution
    # (layers.py LazyUp docstring). Exact algebra, identical params.
    fpn_fuse: bool = False

    def setup(self):
        s2d_pair = (find_s2d_stem(self.specs, self.save)
                    if self.stem_s2d else None)
        self.fpn_ups = (find_fpn_fuse(self.specs, self.save)
                        if self.fpn_fuse else ())
        mods = []
        for s in self.specs:
            if s2d_pair is not None and s.i == s2d_pair[0]:
                mods.append(L.ConvS2DOut(c2=s.args[0]))
                continue
            if s2d_pair is not None and s.i == s2d_pair[1]:
                mods.append(L.ConvS2DIn(c2=s.args[0],
                                        c1=self.specs[s2d_pair[0]].args[0]))
                continue
            if s.n > 1 and s.name not in _REPEAT_BLOCKS:
                # n repeats of a non-repeat block chain n DISTINCT modules
                # (the reference builds n copies via nn.Sequential,
                # tasks.py:905-906) — one shared instance would silently tie
                # their weights
                m = tuple(_build_module(s, dict(self.head), self.enhance_impl,
                                        self.contrast_mode,
                                        self.repconv_deploy)
                          for _ in range(s.n))
            else:
                m = _build_module(s, dict(self.head), self.enhance_impl,
                                  self.contrast_mode, self.repconv_deploy)
            mods.append(m if m is not None else ())
        self.mods = mods

    def __call__(self, x, dedark_A=None, IcA=None, train: bool = False,
                 upto: int | None = None, capture: tuple = ()):
        """Forward; `upto` (static) truncates the layer walk after layer
        index `upto` and returns that activation — used by the roofline
        profiler (scripts/roofline.py) to time stage prefixes. `capture`
        (static tuple of layer indices) additionally returns
        {i: first-image activation sliced to 32 channels} for
        feature_visualization (reference predictor.py:136-162) — sliced on
        device so the host readback stays tiny."""
        saved: Dict[int, jnp.ndarray] = {}
        caps: Dict[int, jnp.ndarray] = {}
        y = x
        raw = None
        for spec, mod in zip(self.specs, self.mods):
            if upto is not None and spec.i > upto:
                return _dense(y)
            if len(spec.f) == 1:
                inp = y if spec.f[0] == -1 else saved[spec.f[0]]
                if isinstance(inp, LazyConcat) and not _spec_takes_list(spec,
                                                                        inp):
                    inp = _dense(inp)
                elif isinstance(inp, L.LazyUp) and spec.name != "Concat":
                    inp = _dense(inp)
            else:
                inp = [y if fi == -1 else saved[fi] for fi in spec.f]
                if spec.name != "Concat":
                    # heads/ASFF/MFRU expect dense per-level tensors
                    inp = [_dense(v) for v in inp]
            if spec.name == "nn.Upsample":
                sf = int(spec.args[1]) if len(spec.args) > 1 and spec.args[1] else 2
                y = (L.LazyUp(_dense(inp), sf) if spec.i in self.fpn_ups
                     else L.upsample_nearest(inp, sf))
            elif spec.name == "Concat":
                # axis 1 (channels) in the ref; kept lazy when the consumer
                # can contract the parts without materializing (ConcatConv)
                parts: List[jnp.ndarray] = []
                for v in inp:
                    parts.extend(v) if isinstance(v, LazyConcat) else parts.append(v)
                lazy = L.ELIDE_CONCAT or any(isinstance(p, L.LazyUp)
                                             for p in parts)
                y = (LazyConcat(parts) if lazy
                     else jnp.concatenate(parts, axis=-1))
            elif spec.name == "lowlight_recovery":
                ecall = (_REMAT_ENHANCE if train and spec.i <= self.remat_upto
                         else _enhance_call)
                y = ecall(mod, inp, dedark_A, IcA, train)
            elif spec.name in _HEADS:
                raw = mod(inp, train=train)
                y = raw
            else:
                call = _module_call
                if train and spec.i <= self.remat_upto:
                    call = _REMAT_CALL
                if spec.n > 1 and spec.name not in _REPEAT_BLOCKS:
                    y = inp
                    for m_i in mod:   # n distinct submodules chained
                        y = call(m_i, y, train)
                else:
                    y = call(mod, inp, train)
            if spec.i in self.save:
                saved[spec.i] = y
            if spec.i in capture:
                if isinstance(y, (LazyConcat, L.LazyUp)):
                    caps[spec.i] = _dense(y)[:1, ..., :32]
                elif not isinstance(y, (list, tuple, dict)):
                    caps[spec.i] = y[:1, ..., :32]
        out = raw if raw is not None else _dense(y)
        return (out, caps) if capture else out


class DetectionModel:
    """Task model: graph + static anchors + loss/decoding glue.

    Counterpart of reference nn/tasks.py:257-343 (DetectionModel), as a plain
    Python wrapper around the pure flax graph (params live outside the object).
    """

    def __init__(self, cfg_dict: dict, nc: Optional[int] = None, verbose: bool = False,
                 enhance_impl: str = "xla", contrast_mode: str = "channel",
                 repconv_deploy: bool = False, remat_upto: int = -1,
                 stem_s2d: bool = False, fpn_fuse: Optional[bool] = None):
        if fpn_fuse is None:
            import os
            fpn_fuse = os.environ.get("DEDARK_FPN_FUSE", "0") == "1"
        import copy
        self.yaml = copy.deepcopy(cfg_dict)
        if nc and nc != self.yaml.get("nc"):
            self.yaml["nc"] = nc
        self.nc = self.yaml["nc"]
        self.specs, self.save, self.head = parse_model(self.yaml, ch=3, verbose=verbose)
        self.strides = self.head["strides"]
        self.task = {"Classify": "classify", "Segment": "segment",
                     "Pose": "pose"}.get(self.head["name"], "detect")
        self.reg_max = 16
        self.no = self.nc + 4 * self.reg_max
        self.repconv_deploy = repconv_deploy
        self.module = YOLOGraph(specs=self.specs, save=tuple(self.save),
                                head=FrozenDict(self.head),
                                enhance_impl=enhance_impl,
                                contrast_mode=contrast_mode,
                                repconv_deploy=repconv_deploy,
                                remat_upto=remat_upto,
                                stem_s2d=stem_s2d,
                                fpn_fuse=bool(fpn_fuse))
        self.names = {i: str(i) for i in range(self.nc)}

    def init(self, rng, imgsz: int = 640, batch: int = 1):
        """Initialize variables (params + batch_stats) on a dummy input.

        Jitted: un-jitted flax init dispatches every op eagerly, which is
        pathologically slow over a remote-device transport.
        """
        x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
        return jax.jit(partial(self.module.init, train=False))(rng, x)

    def apply_train(self, variables, x, dedark_A=None, IcA=None):
        """Forward in train mode; returns (raw_maps, new_batch_stats)."""
        raw, updates = self.module.apply(
            variables, x, dedark_A=dedark_A, IcA=IcA, train=True,
            mutable=["batch_stats"])
        return raw, updates["batch_stats"]

    def apply_eval(self, variables, x, dedark_A=None, IcA=None, decode=True):
        """Forward in eval mode; returns (boxes_xywh, scores) for detect,
        softmax class probabilities for classify, raw maps if decode=False."""
        raw = self.module.apply(variables, x, dedark_A=dedark_A, IcA=IcA, train=False)
        if not decode:
            return raw
        if self.task == "classify":
            return jax.nn.softmax(raw, axis=-1)
        if self.head["name"] == "RTDETRDecoder":
            # NMS-free queries: normalized cxcywh + already-sigmoid scores
            h, w = x.shape[1], x.shape[2]
            scale = jnp.asarray([w, h, w, h], raw.dtype)
            return raw[..., :4] * scale, raw[..., 4:]
        return decode_detections(raw, self.nc, self.strides, self.reg_max)

    def tta_eval(self, variables, x):
        """Test-time-augmented detect inference (reference tasks.py:303-343
        _predict_augment / _descale_pred / _clip_augmented).

        Three forwards at scales [1, 0.83, 0.67] with an lr flip on the
        middle one; each scaled input is bilinear-resized (torch-kernel
        parity) and bottom/right padded with 0.447 to a stride multiple
        (torch_utils.py:270-279 scale_img). Predictions are descaled and
        de-flipped back into the original frame, then the extreme-scale
        anchor tails are clipped — the unscaled pass drops its coarsest
        (P5) level, the most-downscaled pass drops its finest (P3) level —
        and all candidates concatenate for ONE NMS. All shapes are static:
        XLA traces the three branch resolutions once, so TTA stays a single
        compiled graph per input shape (no retracing per frame).
        """
        import math
        from .enhance import torch_bilinear_resize
        h, w = int(x.shape[1]), int(x.shape[2])
        gs = int(max(self.strides))
        nl = len(self.strides)
        g = sum(4 ** i for i in range(nl))
        outs = []
        for si, flip_lr in ((1.0, False), (0.83, True), (0.67, False)):
            xi = x[:, :, ::-1, :] if flip_lr else x
            if si != 1.0:
                sh, sw = int(h * si), int(w * si)
                xi = torch_bilinear_resize(xi, sh, sw)
                ph = math.ceil(h * si / gs) * gs
                pw = math.ceil(w * si / gs) * gs
                xi = jnp.pad(xi, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)),
                             constant_values=0.447)
            boxes, scores = self.apply_eval(variables, xi)
            boxes = boxes / si
            if flip_lr:  # xywh: only the center x mirrors; w/h are invariant
                boxes = boxes.at[..., 0].set(w - boxes[..., 0])
            outs.append((boxes, scores))
        (b0, s0), (b1, s1), (b2, s2) = outs
        i0 = (b0.shape[1] // g) * 1
        b0, s0 = b0[:, :-i0], s0[:, :-i0]
        i2 = (b2.shape[1] // g) * 4 ** (nl - 1)
        b2, s2 = b2[:, i2:], s2[:, i2:]
        return (jnp.concatenate([b0, b1, b2], axis=1),
                jnp.concatenate([s0, s1, s2], axis=1))

    @property
    def kpt_shape(self):
        """(nk, dims) from the Pose head spec (defaults to COCO 17x3)."""
        args = self.head.get("args", ())
        return tuple(args[1]) if len(args) > 1 else (17, 3)

    def eval_outputs(self, variables, x):
        """The task's canonical decoded output tuple — ONE definition shared
        by the exporter, AutoBackend's live branch, and the task predictors/
        validators, so deployed artifacts can never drift from live
        inference:
          detect/rtdetr -> (boxes_xywh, scores)
          segment       -> (boxes, scores, coef_flat, protos)
          pose          -> (boxes, scores, decoded_keypoints)
          classify      -> (probs,)
        """
        if self.task == "segment":
            det, coefs, protos = self.module.apply(variables, x, train=False)
            boxes, scores = decode_detections(det, self.nc, self.strides,
                                              self.reg_max)
            nm = protos.shape[-1]
            coef_flat = jnp.concatenate(
                [m.reshape(m.shape[0], -1, nm) for m in coefs], axis=1)
            return boxes, scores, coef_flat, protos
        if self.task == "pose":
            from .heads import decode_keypoints
            det, kpt_maps = self.module.apply(variables, x, train=False)
            boxes, scores = decode_detections(det, self.nc, self.strides,
                                              self.reg_max)
            return boxes, scores, decode_keypoints(kpt_maps, self.strides,
                                                   self.kpt_shape)
        out = self.apply_eval(variables, x)
        return out if isinstance(out, tuple) else (out,)

    def num_params(self, variables):
        return sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
