"""Torch (Ultralytics) state_dict -> flax param tree converter.

The reference stores checkpoints as pickled nn.Modules (torch.save + dill,
reference trainer.py:408-433) whose unpickling needs the original package
(tasks.py:592-630 legacy remap). The portable interchange point is the
*state_dict*: flat "model.{i}.<submodule>.{weight,bias,...}" -> tensor. Export it
on any machine with torch + the reference installed:

    sd = {k: v.numpy() for k, v in torch.load('best.pt')['model'].float().state_dict().items()}
    np.savez('best_sd.npz', **sd)

then convert here with `convert_state_dict(npz_dict, model)`.

Mapping rules (NCHW torch -> NHWC flax):
  - conv weight (O, I, kh, kw)      -> kernel (kh, kw, I, O)
  - depthwise/grouped conv          -> same transpose (flax groups on I)
  - linear weight (O, I)            -> kernel (I, O)
  - BatchNorm weight/bias           -> scale/bias (params)
  - BatchNorm running_mean/var      -> batch_stats mean/var
  - ExtractParameters2 fc1: torch flattens (C=32, 8, 8) as c*64 + h*8 + w; our
    NHWC flatten is h*256 + w*32 + c — fc1 rows are permuted accordingly.

Module-name correspondence (our flax auto-names -> torch attr names):
  Conv:    Conv_0 -> conv, BatchNorm_0 -> bn
  C2f:     Conv_0 -> cv1, Conv_1 -> cv2, Bottleneck_k -> m.k (cv1/cv2 inside)
  SPPF:    Conv_0 -> cv1, Conv_1 -> cv2
  Detect:  cv2_{i}_{0,1} -> cv2.{i}.{0,1} (Conv), cv2_{i}_2 -> cv2.{i}.2 (bare);
           same for cv3; DFL is functional here (torch's dfl.conv.weight is a
           frozen arange and is ignored)
  lowlight_recovery: ExtractParameters2_0/Conv_k -> extractor.conv_layers.k
           .conv_block.0, Dense_0 -> extractor.fc1, Dense_1 -> extractor.fc2
"""

from __future__ import annotations

import re

import jax
import numpy as np


def _t_conv(wt):
    return np.transpose(wt, (2, 3, 1, 0))


def _t_linear(wt):
    return np.transpose(wt, (1, 0))


def _fc1_permutation(c=32, h=8, w=8):
    """Column permutation mapping our NHWC-flatten index -> torch CHW-flatten index."""
    idx = np.zeros(c * h * w, dtype=np.int64)
    for hh in range(h):
        for ww in range(w):
            for cc in range(c):
                ours = hh * (w * c) + ww * c + cc
                theirs = cc * (h * w) + hh * w + ww
                idx[ours] = theirs
    return idx


def _torch_base(flax_path: str, spec_name: str, spec_args=()) -> str:
    """Map a flax sub-path (inside mods_i) to the torch submodule base name."""
    parts = flax_path.split("/") if flax_path else []

    def conv_pair(sub):  # our Conv module -> torch Conv module's children
        return {"Conv_0": f"{sub}.conv", "BatchNorm_0": f"{sub}.bn"}

    def addconv_pair(sub):  # our AddConv -> torch add_conv Sequential children
        return {"Conv_0": f"{sub}.conv", "BatchNorm_0": f"{sub}.batch_norm"}

    if spec_name in ("Conv", "DWConv"):
        return {"Conv_0": "conv", "BatchNorm_0": "bn"}["/".join(parts[:1])]
    if spec_name in ("SPPF", "SPP", "GhostConv"):
        top = parts[0]
        sub = {"Conv_0": "cv1", "Conv_1": "cv2"}[top]
        return conv_pair(sub)[parts[1]]
    if spec_name == "C2f":
        top = parts[0]
        if top.startswith("Bottleneck_"):
            k = int(top.split("_")[1])
            inner = {"Conv_0": "cv1", "Conv_1": "cv2"}[parts[1]]
            return conv_pair(f"m.{k}.{inner}")[parts[2]]
        sub = {"Conv_0": "cv1", "Conv_1": "cv2"}[top]
        return conv_pair(sub)[parts[1]]
    if spec_name in ("C3", "C3Ghost"):
        top = parts[0]
        if top.startswith("Bottleneck_"):
            k = int(top.split("_")[1])
            inner = {"Conv_0": "cv1", "Conv_1": "cv2"}[parts[1]]
            return conv_pair(f"m.{k}.{inner}")[parts[2]]
        # creation order in our C3: cv1 (Conv_0), bottlenecks, cv2 (Conv_1),
        # cv3 (Conv_2) — matches reference attr names cv1/cv2/cv3
        sub = {"Conv_0": "cv1", "Conv_1": "cv2", "Conv_2": "cv3"}[top]
        return conv_pair(sub)[parts[1]]
    if spec_name == "C3x":
        top = parts[0]
        if top.startswith("CrossConv_"):
            j = int(top.split("_")[1])
            # pairs (2k, 2k+1) -> torch m.k.cv1 / m.k.cv2 (cross kernels live
            # inside the reference Bottleneck's cv1/cv2, block.py:489-496)
            sub = f"m.{j // 2}.cv{j % 2 + 1}"
            return {"Conv_0": f"{sub}.conv", "BatchNorm_0": f"{sub}.bn"}[parts[1]]
        sub = {"Conv_0": "cv1", "Conv_1": "cv2", "Conv_2": "cv3"}[top]
        return conv_pair(sub)[parts[1]]
    if spec_name in ("AsffTribeLevel", "AsffDoubLevel"):
        level = int(spec_args[0]) if spec_args else 0
        top = parts[0]
        if top.startswith("Conv2d_"):
            return "weight_levels"
        if spec_name == "AsffTribeLevel":
            order = (["stride_level_2", "weight_level_0", "weight_level_1",
                      "weight_level_2", "expand"] if level in (0, 1) else
                     ["compress_level_0", "compress_level_1", "weight_level_0",
                      "weight_level_1", "weight_level_2", "expand"])
        else:  # AsffDoubLevel
            order = (["stride_level_1", "weight_level_0", "weight_level_1",
                      "expand"] if level == 0 else
                     ["compress_level_0", "weight_level_0", "weight_level_1",
                      "expand"])
        sub = order[int(top.split("_")[1])]
        return addconv_pair(sub)[parts[1]]
    if spec_name in ("Segment", "Pose"):
        top = parts[0]
        if top == "detect":
            # inherited Detect attrs live directly on the torch module
            return _torch_base("/".join(parts[1:]), "Detect")
        if top == "Proto_0":
            sub = {"Conv_0": "proto.cv1", "ConvTranspose_0": "proto.upsample",
                   "Conv_1": "proto.cv2", "Conv_2": "proto.cv3"}[parts[1]]
            if parts[1] == "ConvTranspose_0":
                return sub
            return conv_pair(sub)[parts[2]]
        m = re.match(r"cv4_(\d+)_(\d+)$", top)
        if m:
            i, j = int(m.group(1)), int(m.group(2))
            if j < 2:
                return conv_pair(f"cv4.{i}.{j}")[parts[1]]
            return f"cv4.{i}.{j}"
    if spec_name == "Classify":
        # reference head.py:244-260: conv (Conv) + pool + linear
        if parts[0] == "Dense_0":
            return "linear"
        return conv_pair("conv")[parts[1]]
    if spec_name in ("Detect", "AsffDetect"):
        top = parts[0]
        m = re.match(r"(cv[23])_(\d+)_(\d+)$", top)
        if m:
            branch, i, j = m.group(1), int(m.group(2)), int(m.group(3))
            if spec_name == "Detect" and j < 2:
                return conv_pair(f"{branch}.{i}.{j}")[parts[1]]
            return f"{branch}.{i}.{j}" if spec_name == "Detect" else f"{branch}.{i}.0"
        m = re.match(r"(cv[23])_(\d+)$", top)  # AsffDetect single 1x1
        if m:
            return f"{m.group(1)}.{m.group(2)}.0"
    if spec_name == "lowlight_recovery":
        top = parts[1] if parts[0] == "ExtractParameters2_0" else parts[0]
        if top.startswith("Conv_"):
            k = int(top.split("_")[1])
            return f"extractor.conv_layers.{k}.conv_block.0"
        if top == "Dense_0":
            return "extractor.fc1"
        if top == "Dense_1":
            return "extractor.fc2"
    raise NotImplementedError(
        f"no torch mapping for '{flax_path}' in module '{spec_name}'")


def convert_state_dict(torch_sd: dict, model, example_variables):
    """Convert a torch state_dict (numpy values) into flax variables.

    Args:
        torch_sd: {"model.{i}.<...>.weight": np.ndarray, ...} (from the
            reference's DetectionModel.state_dict()).
        model: our DetectionModel (for specs).
        example_variables: shape template from jax.eval_shape(model.module.init,...).

    Returns {"params": ..., "batch_stats": ...} with the same structure.
    """
    specs_by_idx = {s.i: s for s in model.specs}
    fc1_perm = _fc1_permutation()

    def lookup(section, path, example):
        keys = [str(getattr(p, "key", p)) for p in path]
        assert keys[0].startswith("mods_"), keys
        i = int(keys[0].split("_")[1])
        spec = specs_by_idx[i]
        leaf = keys[-1]
        sub = "/".join(keys[1:-1])
        base = _torch_base(sub, spec.name, spec.args)
        tkey = f"model.{i}.{base}"
        if section == "params":
            if leaf == "kernel":
                wt = torch_sd[f"{tkey}.weight"]
                if wt.ndim == 4:
                    # ConvTranspose2d stores (I, O, kh, kw) vs Conv2d (O, I, kh, kw),
                    # AND torch's op is the conv gradient (kernel spatially
                    # mirrored) while flax ConvTranspose (transpose_kernel=False)
                    # applies the kernel unflipped in a fractionally-strided
                    # conv — so the spatial axes must be reversed too
                    # (verified numerically vs torch in test_torch_import.py)
                    if any(k.startswith("ConvTranspose") for k in keys):
                        arr = np.transpose(wt, (2, 3, 0, 1))[::-1, ::-1]
                    else:
                        arr = _t_conv(wt)
                else:
                    arr = _t_linear(wt)
                    if base == "extractor.fc1":
                        arr = arr[fc1_perm, :]
                return arr.astype(np.float32)
            if leaf == "scale":
                return torch_sd[f"{tkey}.weight"].astype(np.float32)
            if leaf == "bias":
                return torch_sd[f"{tkey}.bias"].astype(np.float32)
        else:  # batch_stats
            if leaf == "mean":
                return torch_sd[f"{tkey}.running_mean"].astype(np.float32)
            if leaf == "var":
                return torch_sd[f"{tkey}.running_var"].astype(np.float32)
        raise KeyError(f"unhandled leaf {leaf} at {keys}")

    out = {}
    for section in ("params", "batch_stats"):
        leaves_with_path = jax.tree_util.tree_flatten_with_path(
            example_variables[section])[0]
        leaves = []
        for path, example in leaves_with_path:
            arr = lookup(section, path, example)
            assert arr.shape == tuple(example.shape), (
                f"shape mismatch at {path}: torch {arr.shape} vs flax {example.shape}")
            leaves.append(arr)
        out[section] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(example_variables[section]), leaves)
    return out


def export_state_dict(variables, model):
    """Inverse of convert_state_dict (our params -> torch-layout flat dict).
    Used for round-trip testing and for exporting weights back to the torch
    ecosystem."""
    specs_by_idx = {s.i: s for s in model.specs}
    fc1_perm = _fc1_permutation()
    inv_perm = np.argsort(fc1_perm)
    sd = {}
    for section in ("params", "batch_stats"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                variables[section])[0]:
            keys = [str(getattr(p, "key", p)) for p in path]
            i = int(keys[0].split("_")[1])
            spec = specs_by_idx[i]
            leaf_name = keys[-1]
            base = _torch_base("/".join(keys[1:-1]), spec.name, spec.args)
            tkey = f"model.{i}.{base}"
            arr = np.asarray(leaf)
            if section == "params":
                if leaf_name == "kernel":
                    if arr.ndim == 4:
                        if any(k.startswith("ConvTranspose") for k in keys):
                            # inverse of the import mapping: un-flip the
                            # spatial axes, then back to torch (I, O, kh, kw)
                            sd[f"{tkey}.weight"] = np.transpose(
                                arr[::-1, ::-1], (2, 3, 0, 1))
                        else:
                            sd[f"{tkey}.weight"] = np.transpose(arr, (3, 2, 0, 1))
                    else:
                        if base == "extractor.fc1":
                            arr = arr[inv_perm, :]
                        sd[f"{tkey}.weight"] = np.transpose(arr, (1, 0))
                elif leaf_name == "scale":
                    sd[f"{tkey}.weight"] = arr
                elif leaf_name == "bias":
                    sd[f"{tkey}.bias"] = arr
            else:
                if leaf_name == "mean":
                    sd[f"{tkey}.running_mean"] = arr
                elif leaf_name == "var":
                    sd[f"{tkey}.running_var"] = arr
    return sd
